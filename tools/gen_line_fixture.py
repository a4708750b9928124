"""Materialize the committed multi-line document fixture for the
line-level dedup entry (d16): the synthetic ``documents`` table is
single-line by construction, so the CCNet/RefinedWeb line-dedup
semantics (structural '\\n' units, boilerplate repeated ACROSS docs)
need a corpus that actually has lines.

Deterministic (line content derives from doc_id arithmetic, no RNG),
written as ONE sorted parquet file so both engines read identical
bytes and git diffs stay stable:

    PYTHONPATH=. python tools/gen_line_fixture.py

Edge rows pinned (doc_id 220+): all-boilerplate doc (clean text must
be empty, doc gate False), empty text, blank-only lines, a line
duplicated WITHIN one doc (distinct-doc count 1 → kept twice), a
unique-looking line shared by exactly two docs (removed from both),
single-line doc, whitespace-padded boilerplate (trim normalization
must catch it), case-variant boilerplate (exact match → kept), and a
mostly-boilerplate doc (doc gate False with non-empty clean text).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "multiline_docs.parquet",
)

BOILERPLATE = [
    "subscribe to our newsletter for weekly updates",
    "all rights reserved 2020 example media group",
    "click here to read the full article",
    "share this story on your favorite network",
    "this site uses cookies to improve your experience",
    "sign in to leave a comment below",
    "advertisement continue reading the main story",
    "terms of service and privacy policy apply",
    "download our free mobile app today",
    "related articles you might have missed",
]


def body_line(i: int, j: int) -> str:
    return f"doc {i} body line {j} carries token {(i * 31 + j * 7) % 9973}"


def rows() -> list[tuple[int, str, str]]:
    out = []
    for i in range(220):
        lines = []
        if i % 2 == 0:
            lines.append(BOILERPLATE[i % 10])
        lines.extend(body_line(i, j) for j in range(2 + i % 5))
        if i % 3 == 0:
            lines.append(BOILERPLATE[(i + 3) % 10])
        out.append((i, "\n".join(lines), "web"))

    out.append((220, "\n".join(BOILERPLATE[k] for k in (0, 4, 8)), "edge"))
    out.append((221, "", "edge"))
    out.append((222, "   \n \n  ", "edge"))
    out.append(
        (
            223,
            "\n".join(
                ["doc 223 repeats itself verbatim", body_line(223, 0),
                 "doc 223 repeats itself verbatim"]
            ),
            "edge",
        )
    )
    shared = "an oddly specific sentence living in exactly two documents"
    out.append((224, "\n".join([body_line(224, 0), shared]), "edge"))
    out.append((225, "\n".join([shared, body_line(225, 0)]), "edge"))
    out.append((226, body_line(226, 0), "edge"))
    out.append((227, f"   {BOILERPLATE[0]}  \n{body_line(227, 0)}", "edge"))
    out.append((228, f"{BOILERPLATE[1].upper()}\n{body_line(228, 0)}", "edge"))
    out.append(
        (
            229,
            "\n".join([BOILERPLATE[2], BOILERPLATE[5], BOILERPLATE[7],
                       body_line(229, 0)]),
            "edge",
        )
    )
    return out


def main() -> None:
    data = rows()
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in data], pa.int64()),
            "text": pa.array([r[1] for r in data], pa.string()),
            "source": pa.array([r[2] for r in data], pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
