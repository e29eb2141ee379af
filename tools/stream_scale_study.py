"""Streaming-state scaling study — LIVE twins at replicated event volume.

The generic scale study (tools/scale_study.py) times the BATCH twins of
the streaming queries; this tool re-runs the actual Structured
Streaming jobs (readStream -> watermark -> stateful operator ->
AvailableNow -> memory sink) at x1 and at a replicated build produced
by scale_study (default x32), and hash-verifies the tumbling twin's
live output against plain SQL on the big build.

    python tools/scale_study.py --reps 32        # build the x32 dir first
    python tools/stream_scale_study.py [--rep 32]

Recorded in SCALE.md "Measured streaming-state scaling".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=32)
    args = ap.parse_args()

    specs = all_specs()  # loads operator modules in registry order
    from sd2_drp_experimentgen_spark.operators.streaming_ops import _events_dir
    from sd2_drp_experimentgen_spark.streaming import jobs
    from tools.scale_study import scaled_dir

    spark = get_spark(app_name="sd2drp-stream-scale", shuffle_partitions=32)
    big = os.path.join(scaled_dir(args.rep), "events.parquet")
    if not os.path.exists(big):
        print(
            f"missing {big}: run `python tools/scale_study.py --reps "
            f"{args.rep}` first"
        )
        return 1

    cases = [
        ("tumbling_1h_watermarked", jobs.tumbling_1h_watermarked),
        ("session_window_30m", jobs.session_window_30m),
    ]
    for tag, path in (("x1", _events_dir(BASE_SF)), (f"x{args.rep}", big)):
        for name, fn in cases:
            fn(spark, path).count()  # warm
            t0 = time.perf_counter()
            n = fn(spark, path).count()
            print(
                f"{tag:<4} {name}: {round(time.perf_counter() - t0, 2)}s, "
                f"{n} rows",
                flush=True,
            )

    # correctness at scale: BOTH live stateful shapes vs plain SQL —
    # the windowed-agg state (tumbling) and the session-MERGE state
    # (r11: the x128 extension verifies the merge path too, where
    # replicas interleave 1 s apart and sessions genuinely merge
    # across replicas — output rows 95 174 at x128 vs 95 465 at x1,
    # so the state path being checked is the hard one).
    from tools.verify_local import compare, duck_connect

    con = duck_connect(scaled_dir(args.rep))
    all_ok = True
    for qname, fn in (
        ("q_stream_tumbling_watermarked", jobs.tumbling_1h_watermarked),
        ("q_stream_session_window", jobs.session_window_30m),
    ):
        ok, msg = compare(
            qname + "_live", fn(spark, big), con.sql(specs[qname].oracle)
        )
        print(
            f"VERIFY x{args.rep} {qname} (LIVE): "
            f"{'PASS' if ok else 'FAIL'} {msg}",
            flush=True,
        )
        all_ok = all_ok and ok
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
