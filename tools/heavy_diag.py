"""Heavy-path scaling diagnostic: WHERE does 8->32 efficiency go?

Run Y (BENCH.md §3) measured the salted two-shuffle heavy path at a
same-round normalized median of 0.43 and attributed the shortfall to
single-box shuffle contention.  This tool replaces that inference with a
measurement: it decomposes one heavy-path run into its component
sub-plans at a given parallelism and reads per-stage shuffle bytes and
task-time distributions from the local Spark REST API, so the
non-scaling component is identified, not guessed.

Components timed (each as its own noop write over the same corpus):

  full        run_pipeline(docs) with the cost model forcing the salted
              plan (SPARK_GRAFT_RECOVER_MS_PER_SPAN must be set by the
              caller, e.g. 300)
  light       the light branch alone (docs <= threshold, direct stage)
  heavy       the heavy branch alone (gate -> single dataflow: salted
              recover/regroup/finalize, rejected docs riding as
              blanked-spans metadata rows)
  scan        parquet scan + count only (input bandwidth floor)

Usage:
  SPARK_GRAFT_RECOVER_MS_PER_SPAN=300 python tools/heavy_diag.py \
      [--mult 20] [--levels 8,32] [--comps heavy] \
      [--conf spark.shuffle.compress=false ...]

``--conf``/``--comps`` exist to A/B one knob against the BENCH.md §3
decomposition (e.g. is the 10-15x shuffle-write-time inflation the
compression CPU specifically?) without forking the tool.

Diagnostic only — NOT part of the reported scaling protocol
(tools/scaling_bench.py is the evidence path; this tool explains it).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = 0.1


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
        return json.load(r)


def _stage_metrics(spark, since_stage: int) -> list[dict]:
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"/applications/{app}/stages?status=complete")
    out = []
    for s in stages:
        if s["stageId"] < since_stage:
            continue
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            sub = datetime.strptime(s["submissionTime"], fmt)
            comp = datetime.strptime(s["completionTime"], fmt)
            wall = round((comp - sub).total_seconds(), 3)
        except Exception:
            wall = None
        out.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "wall_s": wall,
            "run_ms": s["executorRunTime"],
            "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
            "gc_ms": s.get("jvmGcTime", 0),
            "deser_ms": s.get("executorDeserializeTime", 0),
            "in_mb": round(s["inputBytes"] / 1e6, 1),
            "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "sh_w_ms": round(s.get("shuffleWriteTime", 0) / 1e6),
            "sh_fetch_ms": s.get("shuffleFetchWaitTime", 0),
            "spill_mb": round((s.get("memoryBytesSpilled", 0)
                               + s.get("diskBytesSpilled", 0)) / 1e6, 1),
        })
    return sorted(out, key=lambda d: d["stage"])


def _max_stage(spark) -> int:
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"/applications/{app}/stages")
    return max((s["stageId"] for s in stages), default=-1) + 1


def measure(parallelism: int, mult: int, conf: dict | None = None,
            comps_filter: set[str] | None = None) -> dict:
    from bench import corpus_path
    from ocr_documents_spark.fixtures.gen import docs_for_sf, generate_docs
    from ocr_documents_spark import pipeline as P
    from ocr_documents_spark.pipeline import (DOCS_SCHEMA, read_docs,
                                              run_pipeline)
    from ocr_documents_spark.session import get_spark

    if P.auto_heavy_threshold() >= P.NO_SALT_CUTOFF:
        sys.exit("SPARK_GRAFT_RECOVER_MS_PER_SPAN is unset/too small: the "
                 "cost model picks the single-scan direct plan, so 'full' "
                 "would not decompose into light+heavy. Set it (e.g. 300).")

    n_docs = docs_for_sf(SF) * mult
    path = corpus_path(SF, n_docs)
    spark = get_spark(f"heavy-diag-{parallelism}",
                      master=f"local[{parallelism}]",
                      shuffle_partitions=parallelism,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(4040 + parallelism),
                                  **(conf or {})})
    spark.sparkContext.setLogLevel("ERROR")

    warm_rows = [(d["doc_id"],
                  [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in d["spans"]])
                 for d in generate_docs(parallelism * 4)]
    warm = spark.createDataFrame(warm_rows, DOCS_SCHEMA).repartition(parallelism)
    for _ in range(2):
        run_pipeline(warm, heavy_threshold=4).write.format(
            "noop").mode("overwrite").save()

    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 10))
    docs = read_docs(spark, path)
    docs.count()

    thr = P.auto_heavy_threshold()
    comps = {
        "full": lambda: run_pipeline(docs),
        "light": lambda: P.light_branch(docs, thr),
        "heavy": lambda: P.heavy_branch(docs, thr),
    }
    if comps_filter:
        comps = {k: v for k, v in comps.items() if k in comps_filter}
    out = {"parallelism": parallelism, "docs": n_docs, "threshold": thr,
           "conf": conf or {}, "components": {}}
    for name, build in comps.items():
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        warm_t = time.perf_counter() - t0
        s0 = _max_stage(spark)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        out["components"][name] = {
            "wall_s": round(wall, 3), "first_s": round(warm_t, 3),
            "stages": _stage_metrics(spark, s0)}

    t0 = time.perf_counter()
    docs.count()
    out["components"]["scan"] = {"wall_s": round(time.perf_counter() - t0, 3)}
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", type=int, default=None)
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable) — A/B a knob "
                         "without forking the tool")
    ap.add_argument("--comps", default=None,
                    help="comma list of components to time (full,light,heavy)")
    args = ap.parse_args()

    conf = dict(kv.split("=", 1) for kv in args.conf)
    comps_filter = set(args.comps.split(",")) if args.comps else None

    if args.measure:
        print("RESULT " + json.dumps(
            measure(args.measure, args.mult, conf, comps_filter)))
        return

    results = {}
    for p in (int(x) for x in args.levels.split(",")):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--measure", str(p), "--mult", str(args.mult)]
        for kv in args.conf:
            cmd += ["--conf", kv]
        if args.comps:
            cmd += ["--comps", args.comps]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=3600, env=os.environ)
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            sys.exit(f"--measure {p} failed (rc={proc.returncode}):\n"
                     + proc.stderr[-4000:])
        results[p] = json.loads(line[len("RESULT "):])
        time.sleep(5)

    print(json.dumps(results, indent=1))
    levels = sorted(results)
    if len(levels) == 2:
        a, b = levels
        print("\n== component speedups %d -> %d ==" % (a, b))
        for comp in ("full", "light", "heavy", "scan"):
            if comp not in results[a]["components"]:
                continue
            wa = results[a]["components"][comp]["wall_s"]
            wb = results[b]["components"][comp]["wall_s"]
            print(f"{comp:6s} {wa:8.2f}s -> {wb:8.2f}s   speedup {wa / wb:.2f}x")


if __name__ == "__main__":
    main()
