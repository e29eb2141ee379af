"""Round-14 continuation study: isolated timing + plan dump for one
registered query (noop sink, warm-up + min-of-3, labelled jobs).

    python tools/r14_study_overlap.py <query> [--sf-dir DIR] [--plan OUT]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from sd2_drp_experimentgen_spark.functions.helpers import (  # noqa: E402
    release_persisted,
)
from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plan", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="r14-study", shuffle_partitions=32)
    fn = all_specs()[args.query].fn

    if args.plan:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, args.sf_dir).explain("formatted")
        with open(args.plan, "w") as f:
            f.write(buf.getvalue())
        release_persisted()

    spark.sparkContext.setJobDescription(f"{args.query}: warm-up")
    noop(fn(spark, args.sf_dir))
    release_persisted()
    runs = []
    for i in range(args.runs):
        spark.sparkContext.setJobDescription(f"{args.query}: timed {i}")
        t0 = time.perf_counter()
        noop(fn(spark, args.sf_dir))
        runs.append(round(time.perf_counter() - t0, 3))
        release_persisted()
    print(f"{args.query}: runs={runs} min={min(runs)}")


if __name__ == "__main__":
    main()
