"""Port of PassthroughStreamingJobTest.java:39-121 — CLI parsing/validation
with picocli-parity error text."""

from __future__ import annotations

import pytest

from hri_flink_validation_passthrough_spark.cli import CliError, main, parse_args

BROKER = "--brokers=fake.kafka.com:9093"
TOPIC = "--input=ingest.porcupine.data-int1.in"
PASSWORD = "--password=FakePassword"
STANDALONE = "--standalone"
MGMT = [
    "--mgmt-url=https://mydomain.com/hri",
    "--client-id=myClientId",
    "--client-secret=mySecret",
    "--audience=myAudience",
    "--oauth-url=https://oauthdomain.com/hri",
]


def err(argv):
    with pytest.raises(CliError) as ei:
        parse_args(argv)
    return str(ei.value)


def test_invalid_password_token_unmatched():
    m = err([BROKER, TOPIC, "3737464=FakePassword", STANDALONE])
    assert "Unmatched argument at index" in m and "3737464=FakePassword" in m


def test_missing_brokers():
    m = err([TOPIC, PASSWORD, STANDALONE])
    assert "Missing required option" in m and "--brokers=<brokers>" in m


def test_missing_input_topic():
    m = err([BROKER, PASSWORD, STANDALONE])
    assert "Missing required option" in m and "--input=<inputTopic>" in m


@pytest.mark.parametrize(
    "drop,expect",
    [
        (0, "--mgmt-url=<mgmtUrl>"),
        (1, "--client-id=<mgmtClientId>"),
        (2, "--client-secret=<mgmtClientSecret>"),
        (3, "--audience=<mgmtAudience>"),
        (4, "--oauth-url=<oauthServiceBaseUrl>"),
    ],
)
def test_missing_each_mgmt_option(drop, expect):
    args = [BROKER, TOPIC, PASSWORD] + [a for i, a in enumerate(MGMT) if i != drop]
    m = err(args)
    assert "Missing required option" in m and expect in m


def test_invalid_topic_standalone():
    bad = "ingest-monkey22-noPeriodSeparators"
    m = err([BROKER, f"--input={bad}", PASSWORD, STANDALONE])
    assert f"The Input Topic Name {bad} is invalid" in m
    assert 'It must start with "ingest."' in m


def test_invalid_topic_mgmt():
    bad = "ingest.monkey22-no-in-suffix"
    m = err([BROKER, f"--input={bad}", PASSWORD] + MGMT)
    assert f"The Input Topic Name {bad} is invalid" in m
    assert 'It must end with ".in"' in m


def test_standalone_and_mgmt_are_exclusive():
    m = err([BROKER, TOPIC, PASSWORD, STANDALONE] + MGMT)
    assert "mutually exclusive" in m


def test_neither_mode_given():
    m = err([BROKER, TOPIC, PASSWORD])
    assert "--standalone" in m


def test_valid_standalone_config():
    cfg = parse_args([BROKER, TOPIC, PASSWORD, STANDALONE, "-d", "5000"])
    assert cfg.standalone and cfg.mgmt is None
    assert cfg.brokers == ["fake.kafka.com:9093"]
    assert cfg.batch_completion_delay_ms == 5000
    assert cfg.topics.output == "ingest.porcupine.data-int1.out"
    assert cfg.topics.invalid == "ingest.porcupine.data-int1.invalid"
    assert cfg.topics.notification == "ingest.porcupine.data-int1.notification"


def test_valid_mgmt_config_and_short_flags():
    cfg = parse_args(
        ["-b", "b1:9093,b2:9093", "-i", "ingest.t.s.in", "-p", "pw"] + MGMT
    )
    assert not cfg.standalone
    assert cfg.brokers == ["b1:9093", "b2:9093"]
    assert cfg.mgmt["mgmt_url"] == "https://mydomain.com/hri"
    assert cfg.batch_completion_delay_ms == 300_000  # production default


def test_main_returns_usage_error_code(capsys):
    assert main([TOPIC, PASSWORD, STANDALONE]) == 2
    captured = capsys.readouterr()
    assert "Missing required option" in captured.err
    assert "Usage: validate" in captured.err


def test_run_query_lists_and_runs(capsys):
    """The analytics runner (separate from the parity CLI): --list prints the
    registry; running a query emits JSON rows."""
    import json

    from hri_flink_validation_passthrough_spark.run_query import main

    assert main(["--list"]) == 0
    listed = capsys.readouterr().out.strip().splitlines()
    assert len(listed) >= 150 and any(l.startswith("q1_pricing_summary\t") for l in listed)

    assert main(["no_such_query"]) == 2

    # stop_session=False: build_session getOrCreates, so stopping would kill
    # the suite's shared session
    assert main(["events_topk_users", "--limit", "3", "--cpus", "4"], stop_session=False) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3 and {"user_id", "n_events", "total_value"} <= set(rows[0])
