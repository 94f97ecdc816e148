"""Regenerate README.md's registry-count sentence from the live registry.

VERDICT r10/r11/r12 each caught a stale hand-typed count (a registration
landed without the prose bump).  The fix is structural: this script is the
only writer of those four numbers.  It is invoked automatically by
tests/conftest.py at session start (so any pytest run self-heals the
sentence) and can be run standalone:

    python scripts/gen_readme_counts.py

The sentence's wrapping/wording is preserved — only the numbers are
rewritten — so the README diff is exactly the count change.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")

_SENTENCE = re.compile(
    r"Registry: (\d+) named queries, (\d+) with DuckDB oracles,(\s+)"
    r"(\d+) with a Spark-SQL(\s+)text twin; (\d+) are driver-facing"
)


def registry_counts() -> tuple[int, int, int, int]:
    from datawarehouse_project_spark.catalog import (
        all_oracle_sql,
        all_queries,
        queries,
        spark_sql_surface,
    )

    return (
        len(all_queries()),
        len(all_oracle_sql()),
        len(spark_sql_surface()),
        len(queries()),
    )


def rewrite_text(text: str, counts: tuple[int, int, int, int]) -> str:
    n_all, n_oracle, n_twin, n_driver = counts

    def _sub(m: re.Match) -> str:
        return (
            f"Registry: {n_all} named queries, {n_oracle} with DuckDB oracles,"
            f"{m.group(3)}{n_twin} with a Spark-SQL{m.group(5)}text twin; "
            f"{n_driver} are driver-facing"
        )

    new, n = _SENTENCE.subn(_sub, text)
    if n != 1:
        raise RuntimeError(
            f"README registry sentence matched {n} times (expected 1) — "
            "the anchor wording changed; update scripts/gen_readme_counts.py"
        )
    return new


def regenerate(path: str = README) -> bool:
    """Rewrite the sentence in place; returns True if the file changed."""
    text = open(path).read()
    new = rewrite_text(text, registry_counts())
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


if __name__ == "__main__":
    changed = regenerate()
    print("README.md counts " + ("updated" if changed else "already current"))
