"""Regenerate PLANS.md: capture the physical-plan trees of the headline
operators at sf0.01 and re-emit the annotated document.

Usage: python -c "from tools.gen_plans import main; main()"           # all
       python tools/gen_plans.py name1 name2 ...                     # subset
(A subset run only refreshes the named sections — use it when adding a
wave so the per-wave cost stays at ~3 plans, with a periodic full run
to catch plan drift in the carried suite.)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PLANS_MD = REPO / "PLANS.md"


def capture(
    sf: str = "/root/testdata/sf0.01", only: list[str] | None = None
) -> dict[str, str]:
    sys.path.insert(0, str(REPO))
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.plans.guard import explain_str
    from ai_etl_studio_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = load_all()
    names = _documented_names()
    if only:
        unknown = set(only) - set(names)
        if unknown:
            raise SystemExit(f"not documented in PLANS.md: {sorted(unknown)}")
        names = [n for n in names if n in set(only)]
    return {
        n: explain_str(queries[n](spark, sf), "formatted").split("\n\n")[0]
        for n in names
    }


def _documented_names() -> list[str]:
    """The operators PLANS.md currently documents (## headings)."""
    return re.findall(r"^## (\w+)$", PLANS_MD.read_text(), re.M)


def main(only: list[str] | None = None) -> None:
    plans = capture(only=only)
    text = PLANS_MD.read_text()
    # replace each fenced block following a "## name" heading in place,
    # keeping the hand-written annotations
    for name, tree in plans.items():
        pattern = re.compile(
            rf"(## {name}\n.*?```\n)(.*?)(\n```)", re.S
        )
        if not pattern.search(text):
            # an EMPTY fenced block ("```\n```") never matches this
            # pattern and the lazy group would swallow the next section
            # — refuse instead of corrupting (bit us in r5: seed new
            # sections with a placeholder line inside the fence)
            raise SystemExit(
                f"PLANS.md section for {name} has no well-formed fenced "
                "block (seed it with a non-empty placeholder line)"
            )
        text = pattern.sub(lambda m: m.group(1) + tree + m.group(3), text, count=1)
    PLANS_MD.write_text(text)
    print(f"PLANS.md regenerated for {len(plans)} operators")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
