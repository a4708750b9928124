"""Regenerate the machine-generated plan blocks in PLANS.md.

Keeps every prose annotation and every hand-compressed excerpt (blocks
that do NOT start with ``== Physical Plan ==``); replaces each block
that does with the current ``.explain("formatted")`` tree for the query
named by the section header.  This makes PLANS.md reproducible: prose is
curated, trees are from the code.

Idempotent by construction: the file is REWRITTEN section-by-section,
and a section header that appears more than once keeps only its FIRST
occurrence — appending a plan-audit pass for a query that already has a
section can no longer duplicate it (the round-4 d11/t14/d10 dupes).

Run: PYTHONPATH=/root/repo python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
PLANS = "PLANS.md"


def formatted_tree(df) -> str:
    """The numbered operator tree of explain('formatted') (details omitted)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().splitlines()
    tree: list[str] = []
    for line in lines:
        if not line.strip() and tree:
            break
        tree.append(line.rstrip())
    return "\n".join(tree).rstrip()


def main() -> int:
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY
    from realtimechurnpredictiondataengineering_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # the engine caps plan strings for UI events (session.ENGINE_CONF);
    # here the full tree IS the deliverable
    spark.conf.set("spark.sql.maxPlanStringLength", str(1 << 30))

    text = open(PLANS).read()
    # Split into sections on "## " headers, preserving the preamble.
    parts = re.split(r"(?m)^(## .+)$", text)
    out = [parts[0]]
    refreshed = []
    dropped = []
    seen: set[str] = set()
    for i in range(1, len(parts), 2):
        header, body = parts[i], parts[i + 1]
        name = header.removeprefix("## ").strip()
        if name in seen:
            dropped.append(name)
            continue
        seen.add(name)
        block = re.search(r"```\n== Physical Plan ==\n.*?```", body, re.S)
        if name in REGISTRY and block:
            df = REGISTRY[name][0](spark, SF_DIR)
            new_block = f"```\n{formatted_tree(df)}\n```"
            body = body[: block.start()] + new_block + body[block.end() :]
            refreshed.append(name)
        out.append(header)
        out.append(body)
    open(PLANS, "w").write("".join(out))
    print(f"refreshed {len(refreshed)} plan blocks: {', '.join(refreshed)}")
    if dropped:
        print(f"dropped {len(dropped)} duplicate sections: {', '.join(dropped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
