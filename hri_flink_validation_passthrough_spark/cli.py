"""Command-line surface — parity with the reference's picocli command
(PassthroughStreamingJob.java:31-86, errors per PassthroughStreamingJobTest).

Hand-rolled parsing (not argparse) so the ERROR TEXT matches the picocli
contract the reference's unit tests assert:
- unknown tokens      → "Unmatched argument at index N: '<tok>'"
- missing required    → "Missing required option: '--brokers=<brokers>'"
- topic name rules    → 'The Input Topic Name X is invalid. It must start
                         with "ingest."' / '...must end with ".in"'
- --standalone XOR the five mgmt options (all-or-nothing group)
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

from .model import DEFAULT_BATCH_COMPLETION_DELAY_MS, TopicNameError, TopicQuartet, derive_topics

USAGE = (
    "Usage: validate -b=<brokers>[,<brokers>...] -i=<inputTopic> "
    "[-p=<password>] [-d=<batchCompletionDelay>] "
    "(--standalone | (-m=<mgmtUrl> -c=<mgmtClientId> -s=<mgmtClientSecret> "
    "-a=<mgmtAudience> -o=<oauthServiceBaseUrl>))"
)

# option aliases → (field, value-taking?)
_OPTIONS = {
    "-b": ("brokers", True),
    "--brokers": ("brokers", True),
    "-p": ("password", True),
    "--password": ("password", True),
    "-i": ("input", True),
    "--input": ("input", True),
    "-d": ("batch_completion_delay", True),
    "--batch-completion-delay": ("batch_completion_delay", True),
    "--standalone": ("standalone", False),
    "-m": ("mgmt_url", True),
    "--mgmt-url": ("mgmt_url", True),
    "-c": ("client_id", True),
    "--client-id": ("client_id", True),
    "-s": ("client_secret", True),
    "--client-secret": ("client_secret", True),
    "-a": ("audience", True),
    "--audience": ("audience", True),
    "-o": ("oauth_url", True),
    "--oauth-url": ("oauth_url", True),
}

_MGMT_REQUIRED = [
    ("mgmt_url", "--mgmt-url=<mgmtUrl>"),
    ("client_id", "--client-id=<mgmtClientId>"),
    ("client_secret", "--client-secret=<mgmtClientSecret>"),
    ("audience", "--audience=<mgmtAudience>"),
    ("oauth_url", "--oauth-url=<oauthServiceBaseUrl>"),
]


class CliError(ValueError):
    pass


@dataclass
class JobConfig:
    brokers: list[str]
    input_topic: str
    topics: TopicQuartet
    password: str | None = None
    batch_completion_delay_ms: int = DEFAULT_BATCH_COMPLETION_DELAY_MS
    standalone: bool = False
    mgmt: dict | None = None  # url/client_id/client_secret/audience/oauth_url
    extra: dict = field(default_factory=dict)


def parse_args(argv: list[str]) -> JobConfig:
    vals: dict[str, str | bool] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        name, inline = tok, None
        if "=" in tok and tok.startswith("-"):
            name, inline = tok.split("=", 1)
        if name not in _OPTIONS:
            raise CliError(f"Unmatched argument at index {i}: '{tok}'")
        fieldname, takes_value = _OPTIONS[name]
        if not takes_value:
            vals[fieldname] = True
            i += 1
            continue
        if inline is not None:
            vals[fieldname] = inline
            i += 1
        else:
            if i + 1 >= len(argv):
                raise CliError(f"Missing required parameter for option '{name}'")
            vals[fieldname] = argv[i + 1]
            i += 2

    missing = []
    if "brokers" not in vals:
        missing.append("'--brokers=<brokers>'")
    if "input" not in vals:
        missing.append("'--input=<inputTopic>'")
    standalone = bool(vals.get("standalone", False))
    mgmt_given = {k for k, _ in _MGMT_REQUIRED if k in vals}
    if standalone and mgmt_given:
        raise CliError(
            "Error: --standalone and the Management API options are mutually "
            "exclusive (specify only one group)"
        )
    if not standalone:
        if not mgmt_given:
            raise CliError(
                "Missing required argument (specify one of these): "
                "(--standalone | (-m=<mgmtUrl> -c=<mgmtClientId> "
                "-s=<mgmtClientSecret> -a=<mgmtAudience> "
                "-o=<oauthServiceBaseUrl>))"
            )
        for k, usage in _MGMT_REQUIRED:
            if k not in vals:
                missing.append(f"'{usage}'")
    if missing:
        raise CliError("Missing required option: " + ", ".join(missing))

    input_topic = str(vals["input"])
    try:
        topics = derive_topics(input_topic)
    except TopicNameError as e:
        raise CliError(str(e)) from None

    delay = int(vals.get("batch_completion_delay", DEFAULT_BATCH_COMPLETION_DELAY_MS))
    mgmt = None
    if not standalone:
        mgmt = {k: str(vals[k]) for k, _ in _MGMT_REQUIRED}
    return JobConfig(
        brokers=str(vals["brokers"]).split(","),
        input_topic=input_topic,
        topics=topics,
        password=str(vals["password"]) if "password" in vals else None,
        batch_completion_delay_ms=delay,
        standalone=standalone,
        mgmt=mgmt,
    )


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        config = parse_args(argv)
    except CliError as e:
        print(str(e), file=sys.stderr)
        print(USAGE, file=sys.stderr)
        return 2

    from .session import build_session
    from .sources.kafka import run_validation_job

    spark = build_session("Passthrough")
    query = run_validation_job(spark, config)
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
