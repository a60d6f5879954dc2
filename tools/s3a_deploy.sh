#!/usr/bin/env bash
# S3A connector deploy recipe (SURVEY §2 F2 — the one capability this
# sandbox cannot execute end-to-end: pip-distributed PySpark ships no
# hadoop-aws/aws-sdk jars and the container has no network).
#
# This script is what a real deployment runs ONCE per environment. It:
#   1. detects the Hadoop client version bundled with the installed
#      PySpark (the jar versions MUST match — a hadoop-aws jar from a
#      different Hadoop line fails with linkage errors at runtime);
#      override with MRL_HADOOP_VERSION for clusters that provide their
#      own Hadoop;
#   2. either emits the spark-defaults/--packages configuration that
#      lets Spark's Ivy resolver fetch the matched connector set, or —
#      with --download DIR — fetches the jars from Maven Central (or
#      MAVEN_MIRROR, which may be a file:// fixture) into DIR for
#      air-gapped clusters and emits a spark.jars line instead. The AWS
#      SDK artifact is LINE-SPECIFIC (r12, the r11 advice fix): Hadoop
#      <= 3.3.x links SDK v1 (com.amazonaws:aws-java-sdk-bundle, POM
#      property aws-java-sdk.version), Hadoop >= 3.4 links SDK v2
#      (software.amazon.awssdk:bundle, property aws-java-sdk-v2.version)
#      — and the property lives in the hadoop-PROJECT parent POM, not
#      hadoop-aws's own POM (published child POMs carry managed deps
#      with no literal version), so that is what we parse;
#   3. prints the fs.s3a.* conf block wired to the same MRL_S3_*
#      environment variables tests/test_s3a.py gates on, so the
#      env-gated round-trip test runs unmodified against the deployed
#      endpoint (MinIO or AWS). The S3A cloud-committer lines are
#      emitted ONLY when the matching spark-hadoop-cloud jar is
#      actually present/shipped (r12: pip PySpark does not bundle it;
#      emitting PathOutputCommitProtocol without the jar fails every
#      parquet write with ClassNotFoundException), and
#      fs.s3a.connection.ssl.enabled=false is emitted ONLY for a plain
#      http:// MRL_S3_ENDPOINT (disabling SSL against real AWS breaks
#      the connection).
#
# Usage:
#   tools/s3a_deploy.sh                 # print conf for Ivy resolution
#   tools/s3a_deploy.sh --download DIR  # fetch jars, print spark.jars conf
#
# Then:
#   MRL_S3_ENDPOINT=http://minio:9000 MRL_S3_BUCKET=mrl \
#   MRL_S3_ACCESS_KEY=... MRL_S3_SECRET_KEY=... \
#   python -m pytest tests/test_s3a.py -q      # real round-trip, green
#
# Both modes are exercised end-to-end against a local file:// Maven
# fixture (no network) by tests/test_s3a_deploy.py.
set -euo pipefail

MAVEN=${MAVEN_MIRROR:-https://repo1.maven.org/maven2}

detect_hadoop_version() {
  python - <<'PY'
import glob, os, re, sys
import pyspark
jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
hits = glob.glob(os.path.join(jars, "hadoop-client-api-*.jar"))
if not hits:
    sys.exit("no hadoop-client-api jar under %s — is this a pip PySpark?" % jars)
print(re.search(r"hadoop-client-api-(.+)\.jar", hits[0]).group(1))
PY
}

# spark-hadoop-cloud coordinates must match the installed Spark AND its
# Scala line (the artifact id carries the Scala suffix)
spark_cloud_coords() {
  python - <<'PY'
import glob, os, re
import pyspark
jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
hits = glob.glob(os.path.join(jars, "scala-library-*.jar"))
scala = "2.13"
if hits:
    m = re.search(r"scala-library-(\d+\.\d+)", os.path.basename(hits[0]))
    if m:
        scala = m.group(1)
print("%s %s" % (scala, pyspark.__version__))
PY
}

HV=${MRL_HADOOP_VERSION:-$(detect_hadoop_version)}
echo "# Hadoop client line: ${HV}" >&2
read -r SCALA_VER SPARK_VER <<<"$(spark_cloud_coords)"
CLOUD_ART="spark-hadoop-cloud_${SCALA_VER}"

# Pip PySpark does not bundle spark-hadoop-cloud; a user-provided jar on
# the existing classpath also satisfies the committer requirement.
cloud_jar_present() {
  python - <<'PY'
import glob, os, sys
import pyspark
jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
sys.exit(0 if glob.glob(os.path.join(jars, "spark-hadoop-cloud*.jar")) else 1)
PY
}

HMAJOR=${HV%%.*}
HMINOR=$(echo "${HV}" | cut -d. -f2)
if [[ "${HMAJOR}" -gt 3 || ( "${HMAJOR}" -eq 3 && "${HMINOR}" -ge 4 ) ]]; then
  SDK_LINE=v2
else
  SDK_LINE=v1
fi

HAVE_CLOUD_COMMITTER=false

if [[ "${1:-}" == "--download" ]]; then
  DIR=${2:?usage: s3a_deploy.sh --download DIR}
  mkdir -p "$DIR"
  AWS_JAR_PATH="org/apache/hadoop/hadoop-aws/${HV}/hadoop-aws-${HV}.jar"
  echo "# fetching hadoop-aws ${HV}" >&2
  curl -fsSL -o "${DIR}/hadoop-aws-${HV}.jar" "${MAVEN}/${AWS_JAR_PATH}"
  # The SDK version property is declared in the hadoop-PROJECT parent
  # POM (hadoop-aws's published POM inherits it with no literal value).
  # Property and coordinates are selected per Hadoop line: 3.3.x and
  # earlier manage SDK v1 (aws-java-sdk.version), 3.4+ manage SDK v2
  # (aws-java-sdk-v2.version; some branches spell it
  # aws.java.sdk.v2.version — accept both).
  PROJECT_POM="org/apache/hadoop/hadoop-project/${HV}/hadoop-project-${HV}.pom"
  POM_TEXT=$(curl -fsSL "${MAVEN}/${PROJECT_POM}")
  if [[ "${SDK_LINE}" == "v2" ]]; then
    BUNDLE_VER=$(printf '%s' "${POM_TEXT}" \
      | grep -oE '<aws[.-]java[.-]sdk[.-]v2\.version>[^<]+' \
      | head -1 | cut -d'>' -f2 || true)
    BUNDLE_GROUP_PATH="software/amazon/awssdk/bundle"
    BUNDLE_NAME="bundle"
    BUNDLE_COORDS="software.amazon.awssdk:bundle"
  else
    BUNDLE_VER=$(printf '%s' "${POM_TEXT}" \
      | grep -oE '<aws-java-sdk\.version>[^<]+' \
      | head -1 | cut -d'>' -f2 || true)
    BUNDLE_GROUP_PATH="com/amazonaws/aws-java-sdk-bundle"
    BUNDLE_NAME="aws-java-sdk-bundle"
    BUNDLE_COORDS="com.amazonaws:aws-java-sdk-bundle"
  fi
  if [[ -z "${BUNDLE_VER}" ]]; then
    echo "could not read ${SDK_LINE} SDK version from hadoop-project POM" >&2
    exit 1
  fi
  echo "# fetching ${BUNDLE_COORDS}:${BUNDLE_VER}" >&2
  curl -fsSL -o "${DIR}/${BUNDLE_NAME}-${BUNDLE_VER}.jar" \
    "${MAVEN}/${BUNDLE_GROUP_PATH}/${BUNDLE_VER}/${BUNDLE_NAME}-${BUNDLE_VER}.jar"
  JARS="${DIR}/hadoop-aws-${HV}.jar,${DIR}/${BUNDLE_NAME}-${BUNDLE_VER}.jar"
  # Ship spark-hadoop-cloud too (it provides PathOutputCommitProtocol /
  # BindingParquetOutputCommitter); if the mirror lacks it, fall back to
  # the default committer rather than emitting conf that cannot load.
  CLOUD_PATH="org/apache/spark/${CLOUD_ART}/${SPARK_VER}/${CLOUD_ART}-${SPARK_VER}.jar"
  echo "# fetching ${CLOUD_ART}:${SPARK_VER}" >&2
  if curl -fsSL -o "${DIR}/${CLOUD_ART}-${SPARK_VER}.jar" "${MAVEN}/${CLOUD_PATH}"; then
    JARS="${JARS},${DIR}/${CLOUD_ART}-${SPARK_VER}.jar"
    HAVE_CLOUD_COMMITTER=true
  else
    echo "# WARNING: ${CLOUD_ART}:${SPARK_VER} unavailable from mirror;" >&2
    echo "#          omitting cloud-committer conf (default committer used)" >&2
  fi
  JARS_CONF="spark.jars ${JARS}"
else
  # Ivy resolution pulls hadoop-aws's POM-declared SDK dependency
  # transitively (the right one per line — no hardcoding needed here),
  # and spark-hadoop-cloud for the committers.
  JARS_CONF="spark.jars.packages org.apache.hadoop:hadoop-aws:${HV},org.apache.spark:${CLOUD_ART}:${SPARK_VER}"
  HAVE_CLOUD_COMMITTER=true
fi

# A jar already on the installed classpath also enables the committers.
if ! ${HAVE_CLOUD_COMMITTER} && cloud_jar_present; then
  HAVE_CLOUD_COMMITTER=true
fi

cat <<CONF
# ---- append to spark-defaults.conf (or pass via --conf) ----
${JARS_CONF}
spark.hadoop.fs.s3a.impl org.apache.hadoop.fs.s3a.S3AFileSystem
spark.hadoop.fs.s3a.endpoint \${MRL_S3_ENDPOINT}
spark.hadoop.fs.s3a.access.key \${MRL_S3_ACCESS_KEY}
spark.hadoop.fs.s3a.secret.key \${MRL_S3_SECRET_KEY}
# MinIO and most non-AWS object stores need path-style addressing:
spark.hadoop.fs.s3a.path.style.access true
CONF

# Disable SSL only for an explicitly plain-http endpoint (MinIO dev
# setups); real AWS/https endpoints must keep SSL on.
case "${MRL_S3_ENDPOINT:-}" in
  http://*)
    echo "spark.hadoop.fs.s3a.connection.ssl.enabled false"
    ;;
  *)
    echo "# (plain-http endpoint? add: spark.hadoop.fs.s3a.connection.ssl.enabled false)"
    ;;
esac

if ${HAVE_CLOUD_COMMITTER}; then
  cat <<'CONF'
# committers: the magic committer is the correct choice for S3A output
# (no rename, no HEAD-after-PUT consistency window); requires the
# spark-hadoop-cloud jar shipped above
spark.hadoop.fs.s3a.committer.name magic
spark.sql.sources.commitProtocolClass org.apache.spark.internal.io.cloud.PathOutputCommitProtocol
spark.sql.parquet.output.committer.class org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter
CONF
else
  cat <<'CONF'
# NOTE: spark-hadoop-cloud jar not available — cloud-committer conf
# omitted (writes use the default committer, correct but slower on S3;
# provision org.apache.spark:spark-hadoop-cloud to enable the magic
# committer).
CONF
fi
