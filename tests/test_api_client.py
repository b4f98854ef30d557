"""Buildkite API client tests — parity with buildkite_api_test.go
(param validation, auth header, URL shape) using a stubbed transport."""

import io

import pytest

from buildkite_logs_parquet_spark.sources.logs import BuildkiteAPIClient


def test_token_required():
    with pytest.raises(ValueError, match="API token is required"):
        BuildkiteAPIClient("")


@pytest.mark.parametrize(
    "org,pipeline,build,job,missing",
    [
        ("", "p", "1", "j", "organization"),
        ("o", "", "1", "j", "pipeline"),
        ("o", "p", "", "j", "build"),
        ("o", "p", "1", "", "job"),
    ],
)
def test_param_validation(org, pipeline, build, job, missing):
    with pytest.raises(ValueError, match=f"{missing} is required"):
        BuildkiteAPIClient.validate_params(org, pipeline, build, job)


def test_log_url_shape():
    c = BuildkiteAPIClient("tok")
    assert (
        c.log_url("my-org", "my-pipe", "42", "job-uuid")
        == "https://api.buildkite.com/v2/organizations/my-org/pipelines/my-pipe"
        "/builds/42/jobs/job-uuid/log"
    )


class _FakeResponse(io.BytesIO):
    status = 200

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_fetch_spools_body(tmp_path, monkeypatch):
    c = BuildkiteAPIClient("tok")
    seen = {}

    def fake_urlopen(url):
        seen["url"] = url
        return _FakeResponse(b"\x1b_bk;t=1\x07line one\nline two\n")

    monkeypatch.setattr(c, "_urlopen", fake_urlopen)
    path = c.fetch_job_log("o", "p", "1", "j", spool_dir=str(tmp_path))
    assert seen["url"].endswith("/builds/1/jobs/j/log")
    assert open(path, "rb").read() == b"\x1b_bk;t=1\x07line one\nline two\n"


def test_fetch_non_200_raises(tmp_path, monkeypatch):
    c = BuildkiteAPIClient("tok")

    class _Bad(_FakeResponse):
        status = 401

    monkeypatch.setattr(c, "_urlopen", lambda url: _Bad(b""))
    with pytest.raises(RuntimeError, match="status 401"):
        c.fetch_job_log("o", "p", "1", "j", spool_dir=str(tmp_path))
