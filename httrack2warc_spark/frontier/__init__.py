"""The URL-frontier + fetch scheduler (the north_rule's engine proper)."""

from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler  # noqa: F401
from httrack2warc_spark.frontier.synth import (  # noqa: F401
    SyntheticWeb,
    fixture_web,
    generate_images,
    generate_web,
)
