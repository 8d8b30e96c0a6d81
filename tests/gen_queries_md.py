"""Regenerate QUERIES.md from the plans registry:
python tests/gen_queries_md.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    specs = plans.all_specs()
    lines = [
        "# QUERIES — the driver-checked catalog",
        "",
        "Auto-generated from the `plans/` registry "
        "(`python tests/gen_queries_md.py` regenerates). Every entry is a "
        "`queries()` callable in `__spark_entry__.py`; **oracle** = exact DuckDB SQL "
        "value-hash comparison at sf0.01, **rows-only** = non-SQL-expressible "
        "(UDF/iterative/sketch), checked for execution + row count and pinned by "
        "dedicated pytest where noted. **bench** = timed per round at sf0.1.",
        "",
        f"{len(specs)} queries, "
        f"{sum(1 for s in specs.values() if s.oracle)} oracle-gated, "
        f"{sum(1 for s in specs.values() if s.bench)} benched.",
        "",
        "| Query | Check | Bench | Tags | What it covers |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        doc = " ".join((s.doc or "").split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        lines.append(
            f"| `{name}` | {'oracle' if s.oracle else 'rows-only'} "
            f"| {'✓' if s.bench else ''} | {', '.join(s.tags)} | {doc} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} with {len(specs)} entries")


if __name__ == "__main__":
    main()
