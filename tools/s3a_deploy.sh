#!/usr/bin/env bash
# S3A connector deploy recipe (SURVEY §2 F2 — the one capability this
# sandbox cannot execute end-to-end: pip-distributed PySpark ships no
# hadoop-aws/aws-sdk jars and the container has no network).
#
# This script is what a real deployment runs ONCE per environment. It:
#   1. detects the Hadoop client version bundled with the installed
#      PySpark (the jar versions MUST match — a hadoop-aws jar from a
#      different Hadoop line fails with linkage errors at runtime);
#   2. either emits the spark-defaults/--packages configuration that
#      lets Spark's Ivy resolver fetch the matched connector pair
#      (hadoop-aws + its POM-declared AWS SDK v2 bundle), or — with
#      --download DIR — fetches both jars from Maven Central into DIR
#      for air-gapped clusters and emits a spark.jars line instead;
#   3. prints the fs.s3a.* conf block wired to the same MRL_S3_*
#      environment variables tests/test_s3a.py gates on, so the
#      env-gated round-trip test runs unmodified against the deployed
#      endpoint (MinIO or AWS).
#
# Usage:
#   tools/s3a_deploy.sh                 # print conf for Ivy resolution
#   tools/s3a_deploy.sh --download DIR  # fetch jars, print spark.jars conf
#
# Then:
#   MRL_S3_ENDPOINT=http://minio:9000 MRL_S3_BUCKET=mrl \
#   MRL_S3_ACCESS_KEY=... MRL_S3_SECRET_KEY=... \
#   python -m pytest tests/test_s3a.py -q      # real round-trip, green
set -euo pipefail

MAVEN=${MAVEN_MIRROR:-https://repo1.maven.org/maven2}

hadoop_version() {
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

HV=$(hadoop_version)
echo "# detected PySpark-bundled Hadoop client: ${HV}" >&2

if [[ "${1:-}" == "--download" ]]; then
  DIR=${2:?usage: s3a_deploy.sh --download DIR}
  mkdir -p "$DIR"
  AWS_JAR_PATH="org/apache/hadoop/hadoop-aws/${HV}/hadoop-aws-${HV}.jar"
  POM_PATH="org/apache/hadoop/hadoop-aws/${HV}/hadoop-aws-${HV}.pom"
  echo "# fetching hadoop-aws ${HV}" >&2
  curl -fsSL -o "${DIR}/hadoop-aws-${HV}.jar" "${MAVEN}/${AWS_JAR_PATH}"
  # the matched AWS SDK v2 bundle version is declared in hadoop-aws's
  # own POM (property aws-java-sdk-v2.version / the bundle dependency)
  # — read it from there instead of hardcoding a pin that drifts
  BUNDLE_VER=$(curl -fsSL "${MAVEN}/${POM_PATH}" \
    | grep -oE '<aws[^<>]*version>[0-9][^<]*</' \
    | grep -oE '[0-9][0-9.]*' | head -1)
  if [[ -z "${BUNDLE_VER}" ]]; then
    echo "could not read SDK bundle version from hadoop-aws POM" >&2
    exit 1
  fi
  echo "# fetching software.amazon.awssdk:bundle:${BUNDLE_VER}" >&2
  curl -fsSL -o "${DIR}/awssdk-bundle-${BUNDLE_VER}.jar" \
    "${MAVEN}/software/amazon/awssdk/bundle/${BUNDLE_VER}/bundle-${BUNDLE_VER}.jar"
  JARS_CONF="spark.jars ${DIR}/hadoop-aws-${HV}.jar,${DIR}/awssdk-bundle-${BUNDLE_VER}.jar"
else
  JARS_CONF="spark.jars.packages org.apache.hadoop:hadoop-aws:${HV}"
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
spark.hadoop.fs.s3a.connection.ssl.enabled false
# committers: the magic committer is the correct choice for S3A output
# (no rename, no HEAD-after-PUT consistency window)
spark.hadoop.fs.s3a.committer.name magic
spark.sql.sources.commitProtocolClass org.apache.spark.internal.io.cloud.PathOutputCommitProtocol
spark.sql.parquet.output.committer.class org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter
CONF
