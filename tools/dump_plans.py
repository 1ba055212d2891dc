"""Dump .explain("formatted") for named queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [<query> ...]
e.g.:  python tools/dump_plans.py r10 before ann_ivfpq_residual random_walk_corpus
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001 — plan SHAPE, not perf).

Iterative/multi-action operators (cycle fixpoints, persisted indexes) execute
their rounds while BUILDING the frame; the dumped plan is the final frame's —
still the artifact that shows retained partitioning/exchange placement.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        print("usage: dump_plans.py <tag> <suffix> <query> [...]", file=sys.stderr)
        sys.exit(2)
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from milan_spark.catalog import queries
    from milan_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("milan_dump_plans")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — {sf_dir}, captured by tools/dump_plans.py\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
