"""S6 — hts-ioinfo.txt header-block scan.

Reference: ``httrack/HtsIoinfoParser.java:26-105`` — a stateful multi-line
parser with three dialects:

- modern: ``[n] request for URL:`` / ``[n] response for URL:`` header lines,
  body lines prefixed ``<<< `` (request) / ``>>> `` (response), terminated by
  a blank line or an empty prefixed line;
- 3.01:  ``Out:`` followed by a raw ``GET http://URL HTTP/1.x`` request line
  (the URL comes from the request line itself);
- buffered responses: ``(Buffer) Status-Code=NNN`` fabricates an
  ``HTTP/1.0 NNN OK`` status line, body lines prefixed ``(buffer)>``;
- ``code=NNN`` lines on responses set the status code; ``---> QUIT`` lines
  and blanks are skipped between records.

The per-record header text is rebuilt with CRLF line ends and a trailing
blank line, byte-identical to the reference (golden:
``HtsIoinfoParserTest.java:27-110``).

The parse is inherently sequential *within one file*, so the pure-Python
``parse_ioinfo_lines`` is the kernel and Spark-side distribution happens at
the file level: ``read_ioinfo`` reads the file with ``wholetext`` and runs the
kernel in ``mapInPandas`` (executor-side; a multi-crawl ingest maps the same
kernel over many files in parallel). Output: one row per header block with
its FIFO occurrence ordinal — the build side of the ordinal join (J1).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_ioinfo_lines", "read_ioinfo"]

_HEADER_RE = re.compile(r"(?:\[\d+] )?(request|response) for (.*):")
_REQUEST_RE = re.compile(r"(?:[A-Z]+) http://(.*) HTTP/1\.[01]")


class IoinfoParseError(ValueError):
    pass


def parse_ioinfo_lines(lines: list[str]) -> list[dict]:
    """→ [{url, kind, header, code, file_seq}] in file order."""
    out: list[dict] = []
    it = iter(lines)
    file_seq = 0

    def next_line():
        return next(it, None)

    while True:
        header_line = next_line()
        if header_line is None:
            return out
        if header_line == "" or header_line.startswith("---> QUIT"):
            continue

        buf: list[str] = []
        if header_line == "Out:":  # HTTrack 3.01 dialect
            request_line = next_line()
            m = _REQUEST_RE.fullmatch(request_line or "")
            if not m:
                raise IoinfoParseError(f"invalid request line: {request_line}")
            buf.append(request_line)
            request = True
            url = m.group(1)
            prefix = ""
        else:
            m = _HEADER_RE.fullmatch(header_line)
            if not m:
                raise IoinfoParseError(f"invalid header line: {header_line}")
            request = m.group(1) == "request"
            url = m.group(2)
            prefix = "<<< " if request else ">>> "

        code = 0
        while True:
            line = next_line()
            if line is None:
                raise IoinfoParseError("missing trailer")
            if line == "":
                break
            if line.startswith("(Buffer) Status-Code="):
                code = int(line[len("(Buffer) Status-Code=") :])
                prefix = "(buffer)>"
                buf.append(f"HTTP/1.0 {code} OK")
            elif line.startswith(prefix):
                body = line[len(prefix) :]
                if body == "":
                    break
                buf.append(body)
            elif not request and line.startswith("code="):
                code = int(line[len("code=") :])
            else:
                raise IoinfoParseError(f"invalid hts-ioinfo.txt header line: {line}")

        header = "\r\n".join(buf) + "\r\n\r\n"
        out.append(
            {
                "url": url,
                "kind": "request" if request else "response",
                "header": header,
                "code": code,
                "file_seq": file_seq,
            }
        )
        file_seq += 1


def read_ioinfo(spark: SparkSession, path: str) -> DataFrame:
    """(url, kind, header, code, file_seq) — executor-side parse."""
    whole = spark.read.text(path, wholetext=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for text in pdf["value"]:
                recs = parse_ioinfo_lines([l.rstrip("\r") for l in text.split("\n")])
                yield pd.DataFrame(
                    recs, columns=["url", "kind", "header", "code", "file_seq"]
                )

    return whole.mapInPandas(
        run, schema="url string, kind string, header string, code int, file_seq long"
    )
