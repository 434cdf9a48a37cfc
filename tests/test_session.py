"""Session factory config tests (no SparkSession needed)."""

from __future__ import annotations

from cqdg_etl_spark.session import s3a_dev_conf


def test_s3a_dev_conf_shape(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test-access-key")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test-secret-key")
    conf = s3a_dev_conf()
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "test-access-key"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "test-secret-key"


def test_s3a_dev_conf_no_env_no_keys(monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    conf = s3a_dev_conf(endpoint="https://minio.internal:9000")
    assert "spark.hadoop.fs.s3a.access.key" not in conf
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"
