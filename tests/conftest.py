import zipfile
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
TESTCRAWL_ZIP = (
    REFERENCE
    / "test-resources/au/gov/nla/httrack2warc/httrack/testcrawl-3.49-2.zip"
)
FIXTURES = REFERENCE / "test-resources/au/gov/nla/httrack2warc/httrack"


@pytest.fixture(scope="session")
def spark():
    from httrack2warc_spark import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def crawl_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("testcrawl")
    with zipfile.ZipFile(TESTCRAWL_ZIP) as zf:
        zf.extractall(d)
    return str(d)
