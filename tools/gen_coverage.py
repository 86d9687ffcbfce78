"""Regenerate COVERAGE.md's query-catalog section from the registry
metadata (samza_spark.registry_meta). The section between the BEGIN/END
markers is machine-owned; everything outside is hand-maintained.

    python tools/gen_coverage.py        # rewrites COVERAGE.md in place
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BEGIN = "<!-- BEGIN GENERATED QUERY CATALOG (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED QUERY CATALOG -->"


def render() -> str:
    from samza_spark.queries import ORACLES, QUERIES
    from samza_spark.registry_meta import FAMILIES, query_meta

    meta = query_meta()
    lines = [
        BEGIN,
        "",
        "## Query catalog by family (generated)",
        "",
        f"{len(QUERIES)} registered queries, {len(ORACLES)} oracle-paired. "
        "Tier key: **exact** = audit lane, hash-exact oracle; **serving** = "
        "deterministic approximation (ANN/sketch) with an exact twin in the "
        "same family; **streaming** = batch analog of a stateful streaming "
        "operator; **report** = monitoring aggregate; **canary** = oracle-"
        "primitive probe (not an operator). Machine-readable via "
        "`__spark_entry__.query_meta()`.",
        "",
        "| Family | n | Tiers | Queries |",
        "|---|---|---|---|",
    ]
    for fam, names in FAMILIES.items():
        tiers = sorted({meta[n]["tier"] for n in names})
        marked = [
            n + ("" if meta[n]["tier"] == "exact" else f" ({meta[n]['tier'][:1]})")
            for n in names
        ]
        lines.append(
            f"| {fam} | {len(names)} | {', '.join(tiers)} | {', '.join(marked)} |"
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(path) as fh:
        doc = fh.read()
    section = render()
    if BEGIN in doc:
        pre = doc.split(BEGIN)[0]
        post = doc.split(END, 1)[1]
        doc = pre + section + post
    else:
        doc = doc.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as fh:
        fh.write(doc)
    print(f"wrote catalog section ({len(section)} chars) into {os.path.normpath(path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
