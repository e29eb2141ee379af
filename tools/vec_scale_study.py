"""Vector-family scaling study — crossing the broadcast gate for real.

The fixtures top out at 2 000 embeddings (sf0.1), so the exact cosine
family's 100 TB path — the block-partitioned plans behind
BROADCAST_MAX_ROWS (vectors.py) — had only ever executed in unit tests
with the gate monkeypatched to 0 over toy inputs. This study grows the
embedding table PAST the real 200 000-row gate and proves the paths at
the sizes that actually select them.

Replication scheme (deterministic, geometry-preserving): replica r of
vector v gets ``vec_id += r * 10**7`` and embedding
``normalize(0.8*e + 0.6*g)`` where g is a unit Gaussian direction drawn
from ``numpy.random.default_rng(r * 2**33 + vec_id)`` — per-row
seeding, so the build is independent of Spark partitioning. Replica 0
is the original corpus unchanged. cos(e, e') ≈ 0.8 keeps replicas
inside their label's cluster (IVF still has coarse structure to
exploit) while making them NOT near-duplicates, so a vector's top-k
mixes replicas and originals: this is corpus GROWTH, not k-fold
duplication of the same workload (the dedup-study lesson applied to
vectors — identical replicas would make every top-k list degenerate
ties at sim 1.0).

What each scale measures:
  x32  (64 000 rows)  — broadcast path, BELOW the gate, polling the
       pyspark worker processes' peak RSS from /proc. A separate
       `--reps 32 --probe-unchunked` invocation measures the pre-r10
       kernel (one batch×n float64 product per Arrow batch): it
       OOM-KILLS the python workers on this 128 GiB box at a third of
       the gate — the gate guarded the driver collect, not the worker
       product — and even when a run survives, the daemon workers
       keep the multi-GB arenas, contaminating every later wall in
       the same session; hence its own process. The shipped kernel is
       bounded at SIMS_BUDGET_BYTES.
  x128 (256 000 rows) — the gate flips: q_emb_knn_graph,
       q_sim_cosine_topk and q_dedup_embedding_nn run their blocked
       plans at a size where the broadcast path is no longer chosen.
       Verification (--verify):
         1. blocked ≡ broadcast: the gate is overridden upward and the
            (chunked) broadcast path re-runs q_emb_knn_graph; the two
            exact plans must match row-for-row (the pytest assertion,
            at gate-crossing size).
         2. capped cross-engine: DuckDB computes the exact kNN rows
            for a 50-src sample (50×n pairs, not n² — the x64 dedup
            study's capped-verify pattern) and the blocked output must
            match on that sample through the driver-faithful compare.
  q_ann_ivf_topk rides along at every scale: its output embeds the
  exact brute-force top-1 and an aggregate recall@10 >= 0.8 witness,
  so ANN quality at scale is read straight off the result.

    python tools/vec_scale_study.py [--reps 32 128] [--verify]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import sd2_drp_experimentgen_spark.operators.vectors as V  # noqa: E402
from sd2_drp_experimentgen_spark.plans import all_specs  # noqa: E402
from sd2_drp_experimentgen_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
VEC_STRIDE = 10**7
MIX_OLD, MIX_NEW = 0.8, 0.6  # cos(e, e') ≈ MIX_OLD for unit vectors

STUDY_QUERIES = [
    "q_emb_knn_graph",
    "q_sim_cosine_topk",
    "q_dedup_embedding_nn",
    "q_ann_ivf_topk",
]
SAMPLE_SRCS = 50  # capped cross-engine verify: srcs sampled for DuckDB


def scaled_dir(rep: int) -> str:
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "vecscale"
    )
    return os.path.abspath(os.path.join(root, f"x{rep}"))


def build(spark, rep: int) -> str:
    out = scaled_dir(rep)
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    base = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    reps = spark.range(rep).select(F.col("id").cast("int").alias("rep"))
    crossed = base.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep").cast("long") * VEC_STRIDE).alias(
            "new_vec_id"
        ),
        F.col("vec_id").alias("base_vec_id"),
        "rep",
        "embedding",
        "label",
    )

    def perturb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            out_mat = mat.copy()
            rs = pdf["rep"].to_numpy()
            bids = pdf["base_vec_id"].to_numpy(dtype=np.int64)
            for i in range(len(pdf)):
                r = int(rs[i])
                if r == 0:
                    continue  # replica 0 IS the original corpus
                g = np.random.default_rng(
                    r * 2**33 + int(bids[i])
                ).standard_normal(mat.shape[1])
                g /= np.sqrt(g @ g)
                e = MIX_OLD * mat[i] + MIX_NEW * g
                out_mat[i] = e / np.sqrt(e @ e)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["new_vec_id"].to_numpy(dtype=np.int64),
                    "embedding": [
                        row.astype(np.float32) for row in out_mat
                    ],
                    "label": pdf["label"].to_numpy(dtype=np.int32),
                }
            )

    crossed.mapInPandas(
        perturb, schema="vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(marker, "w").write("ok")
    return out


class WorkerRssProbe:
    """Poll /proc for pyspark worker/daemon processes and track the max
    RSS seen across all of them while a query runs. VmRSS only — VmHWM
    would be the true per-process high-water mark, but the daemon
    worker is REUSED across queries, so its HWM carries the previous
    query's peak and would contaminate every later measurement. A
    25 ms VmRSS poll catches the multi-GB plateaus this study cares
    about (a product allocation lives for the whole product+rank loop,
    seconds at these sizes)."""

    def __init__(self) -> None:
        self.max_rss = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _scan_once(self) -> None:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read()
                if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                    continue
                with open(f"/proc/{pid}/status") as fh:
                    for line in fh:
                        if line.startswith("VmRSS:"):
                            kb = int(line.split()[1])
                            self.max_rss = max(self.max_rss, kb * 1024)
            except (OSError, ValueError):
                continue  # process exited mid-scan

    def _run(self) -> None:
        while not self._stop.is_set():
            self._scan_once()
            time.sleep(0.025)

    def __enter__(self) -> "WorkerRssProbe":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()
        self._scan_once()


def timed(fn, spark, d: str) -> tuple[float, list, int]:
    """One timed run with the RSS probe -> (wall_s, rows, peak_rss)."""
    with WorkerRssProbe() as probe:
        t0 = time.perf_counter()
        rows = fn(spark, d).collect()
        wall = time.perf_counter() - t0
    return round(wall, 2), rows, probe.max_rss


def gb(n: int) -> str:
    return f"{n / (1 << 30):.2f} GB"


def run_index(spark, reps: list[int]) -> int:
    """r14: the stored-index lifecycle at gate-crossing scale. The
    write-once-probe-many claim decomposed and measured per scale:
      - full query wall (encode + 16-way partitioned write + probe),
        which must scale with the CORPUS;
      - probe-only wall over the already-written index, which must
        scale with the PROBED CELLS (static PartitionFilters pruning
        — probed_codes/total_codes is printed as the pruning ratio);
      - the IVFPQ recall curve (q_ann_ivfpq_recall_curve) re-run at
        the scaled corpus, so quality-vs-nprobe is evidence at 64k
        and 256k vectors, not just the 2k fixture.
    Replicas are geometry-preserving (module docstring), so the
    coarse cells keep real cluster structure at every scale."""
    from sd2_drp_experimentgen_spark.functions.helpers import (
        release_persisted,
    )
    from sd2_drp_experimentgen_spark.operators import vectors as V2
    from sd2_drp_experimentgen_spark.operators.scans import _scratch

    specs = all_specs()
    out: dict = {}
    for rep in [1] + reps:
        d = BASE_SF if rep == 1 else build(spark, rep)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        fn = specs["q_ann_index_partitioned"].fn
        fn(spark, d).collect()  # warm (writes the index)
        release_persisted()
        t_full = min(timed(fn, spark, d)[0] for _ in range(2))
        release_persisted()

        path = _scratch(d, "pq_index_by_cell")
        probe, lut, cells = V2._index_probe_plan(spark, d)
        idx = spark.read.parquet(path)
        total_codes = idx.count()
        probed_codes = idx.where(F.col("cell").isin(cells)).count()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            V2._probe_stored_index(spark, path, probe, lut, cells).collect()
            walls.append(time.perf_counter() - t0)
        t_probe = round(min(walls), 3)
        release_persisted()

        curve = {
            int(r["nprobe"]): {
                "cand": int(r["cand_rows"]),
                "recall": float(r["recall_at10"]),
            }
            for r in specs["q_ann_ivfpq_recall_curve"].fn(spark, d).collect()
        }
        release_persisted()
        out[rep] = {
            "n": n,
            "full_query_s": t_full,
            "probe_only_s": t_probe,
            "total_codes": total_codes,
            "probed_codes": probed_codes,
            "prune_ratio": round(probed_codes / max(total_codes, 1), 3),
            "recall_curve": curve,
        }
        print(
            f"x{rep:<4} n={n}: full {t_full}s, probe-only {t_probe}s, "
            f"pruned to {probed_codes}/{total_codes} codes "
            f"({out[rep]['prune_ratio']}), recall@10 "
            + ", ".join(
                f"np{k}={v['recall']:.3f}" for k, v in sorted(curve.items())
            ),
            flush=True,
        )
    print(json.dumps({"index_study": out}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", nargs="*", type=int, default=[32, 128])
    ap.add_argument("--verify", action="store_true")
    ap.add_argument(
        "--probe-unchunked",
        action="store_true",
        help="ALSO measure the pre-r10 unchunked kernel (expects OOM "
        "at x32; contaminates later walls — run as its own process)",
    )
    ap.add_argument("--index", action="store_true",
                    help="stored-index lifecycle study (r14)")
    args = ap.parse_args()
    if args.index:
        spark = get_spark(
            app_name="sd2drp-vec-scale", shuffle_partitions=32
        )
        return run_index(spark, args.reps)

    spark = get_spark(app_name="sd2drp-vec-scale", shuffle_partitions=32)
    specs = all_specs()
    result: dict = {"budget_bytes": V.SIMS_BUDGET_BYTES, "scales": {}}

    for rep in args.reps:
        d = build(spark, rep)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        path = "blocked" if n > V.BROADCAST_MAX_ROWS else "broadcast"
        row: dict = {"n": n, "path": path}
        print(f"== x{rep}: n={n} -> {path} path ==", flush=True)

        if path == "broadcast" and args.probe_unchunked:
            # Pre-r10 behavior: disable chunking (one batch×n product
            # per Arrow batch) and record what it costs. ISOLATED
            # behind a flag because the probe OOM-KILLS python workers
            # at x32 on this 128 GiB box, and even when it survives,
            # the daemon workers keep the multi-GB arenas — every
            # later measurement in the same session reads high. Run
            # `--reps 32 --probe-unchunked` as its own process.
            specs["q_dedup_embedding_nn"].fn(spark, d).collect()  # warm
            saved = V.SIMS_BUDGET_BYTES
            V.SIMS_BUDGET_BYTES = 1 << 62
            try:
                wall, rows, rss = timed(
                    specs["q_emb_knn_graph"].fn, spark, d
                )
                row["knn_unchunked"] = {"wall": wall, "rss": rss}
                print(
                    f"  q_emb_knn_graph UNCHUNKED: {wall}s, "
                    f"{len(rows)} rows, peak worker RSS {gb(rss)}",
                    flush=True,
                )
            except Exception as exc:  # the probe CRASHING is a result
                row["knn_unchunked"] = {
                    "crashed": str(exc).splitlines()[0][:200]
                }
                print(
                    "  q_emb_knn_graph UNCHUNKED: CRASHED — python "
                    "workers died under the batch×n allocation "
                    f"({type(exc).__name__})",
                    flush=True,
                )
            finally:
                V.SIMS_BUDGET_BYTES = saved

        knn_rows = None
        for q in STUDY_QUERIES:
            wall, rows, rss = timed(specs[q].fn, spark, d)
            row[q] = {"wall": wall, "rows": len(rows), "rss": rss}
            print(
                f"  [{time.strftime('%H:%M:%S')}] {q}: {wall}s, "
                f"{len(rows)} rows, peak worker RSS {gb(rss)}",
                flush=True,
            )
            if q == "q_emb_knn_graph":
                knn_rows = rows  # reused by --verify: no third run
            if q == "q_ann_ivf_topk":
                n_ok = sum(1 for r in rows if r["recall_ok"])
                row["ivf_recall_ok"] = f"{n_ok}/{len(rows)}"
                print(f"    recall_ok witness: {n_ok}/{len(rows)}", flush=True)

        if args.verify and n > V.BROADCAST_MAX_ROWS:
            import pandas as pd

            # 1. blocked == broadcast at gate-crossing size: the timed
            # loop already collected the blocked result (knn_rows);
            # override the gate upward so the (chunked) broadcast path
            # runs the same query, and bit-compare.
            blocked_pdf = (
                pd.DataFrame([r.asDict() for r in knn_rows])
                .sort_values(["src", "rank"])
                .reset_index(drop=True)
            )
            saved = V.BROADCAST_MAX_ROWS
            V.BROADCAST_MAX_ROWS = 1 << 62
            try:
                t0 = time.perf_counter()
                bcast_rows = specs["q_emb_knn_graph"].fn(spark, d).collect()
                row["broadcast_override_wall"] = round(
                    time.perf_counter() - t0, 2
                )
            finally:
                V.BROADCAST_MAX_ROWS = saved
            bcast_pdf = (
                pd.DataFrame([r.asDict() for r in bcast_rows])
                .sort_values(["src", "rank"])
                .reset_index(drop=True)
            )
            same = blocked_pdf.equals(bcast_pdf)
            row["blocked_eq_broadcast"] = bool(same)
            print(
                f"  VERIFY blocked==broadcast ({len(blocked_pdf)} rows): "
                f"{'PASS' if same else 'FAIL'}",
                flush=True,
            )
            if not same:
                return 1

            # 2. capped cross-engine: DuckDB ground truth for a 50-src
            # sample (50×n pairs, never n²). The study dir holds ONLY
            # the embeddings table, so register that one view directly
            # instead of duck_connect's full-fixture battery.
            import duckdb

            from tools.verify_local import compare

            srcs = sorted(blocked_pdf["src"].unique()[:SAMPLE_SRCS])
            in_list = ", ".join(str(s) for s in srcs)
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet/*.parquet')"
            )
            oracle = f"""
            WITH pairs AS (
              SELECT a.vec_id AS src, b.vec_id AS dst,
                     list_cosine_similarity(
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE))
                     ) AS sim
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id IN ({in_list})
            ),
            ranked AS (
              SELECT src, dst,
                     floor(sim * 10000 + 0.5) / 10000 AS sim,
                     row_number() OVER (
                       PARTITION BY src
                       ORDER BY floor(sim * 10000 + 0.5) DESC, dst
                     ) AS rank
              FROM pairs
            )
            SELECT src, CAST(rank AS BIGINT) AS rank, dst, sim
            FROM ranked WHERE rank <= {V.KNN_K}
            """
            # The blocked result is already in hand — compare the
            # sampled slice of it rather than re-running the full job.
            sampled = spark.createDataFrame(
                blocked_pdf[blocked_pdf["src"].isin(srcs)],
                schema="src long, rank long, dst long, sim double",
            )
            ok, msg = compare(
                "q_emb_knn_graph[sample]", sampled, con.execute(oracle)
            )
            row["duckdb_sample"] = msg
            print(
                f"  VERIFY DuckDB {SAMPLE_SRCS}-src sample: "
                f"{'PASS' if ok else 'FAIL'} {msg}",
                flush=True,
            )
            if not ok:
                return 1

        result["scales"][rep] = row

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
