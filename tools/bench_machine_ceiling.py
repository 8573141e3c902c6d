#!/usr/bin/env python
"""Machine-ceiling control for the N-vs-4N scaling gate.

Runs the pure-Python NER core (no Spark, no JVM — a multiprocessing
pool over the same per-page predict() work the pipeline's Arrow UDF
does) pinned to N and 4N cores, and reports

    ceiling = tput(4N) / (4 * tput(N))

This isolates HOST physics — per-core clock scaling (turbo binds at
low occupancy), shared memory bandwidth, hypervisor neighbors — from
Spark's orchestration: no distributed engine can scale a CPU-bound
python workload better than this number on this box, so the pipeline's
measured efficiency should be read AGAINST it (pipeline/ceiling ≈ the
orchestration efficiency a real cluster would see, where per-core
clocks do not depend on how many cores the job happens to use).

    python tools/bench_machine_ceiling.py [--pages 60000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _texts(n_pages: int):
    # 300-word pages with ~4% mention density — the same shape as the
    # Spark scaling fixture (bench_scaling.generate_pages), so the two
    # measurements stress the same python hot path
    from kgkit.ner_core.train import synth_words

    return [
        " ".join(w)
        for w in synth_words(n_pages, words_per_page=300, n_filler=200)
    ]


def _work(chunk):
    from kgkit.ner_core import predict

    return sum(len(r) for r in predict(chunk, level="entity", autocorrect=True))


def worker(procs: int, n_pages: int) -> None:
    import multiprocessing as mp

    texts = _texts(n_pages)
    chunks = [texts[i::procs * 4] for i in range(procs * 4)]
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_work, chunks[:procs])  # warmup: fork + import + caches
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            pool.map(_work, chunks)
            wall = time.monotonic() - t0
            best = wall if best is None else min(best, wall)
    print(json.dumps({"procs": procs, "pages_per_sec": round(n_pages / best, 1),
                      "wall": round(best, 2)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=0)
    ap.add_argument("--pages", type=int, default=60_000)
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.pages)
        return
    import shutil

    use_taskset = shutil.which("taskset") is not None
    results = {}
    for procs in (int(x) for x in args.levels.split(",")):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(procs), "--pages", str(args.pages)]
        if use_taskset:
            cmd = ["taskset", "-c", f"0-{procs - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[procs] = json.loads(line)
        print(line, file=sys.stderr)
    (n, tn), (n4, t4) = sorted(results.items())
    eff = results[n4]["pages_per_sec"] / (
        (n4 / n) * results[n]["pages_per_sec"]
    )
    print(json.dumps({
        "metric": "machine_ceiling_N_to_4N", "value": round(eff, 3),
        "n": n, "n4": n4, "pages": args.pages,
        "pages_per_sec_N": results[n]["pages_per_sec"],
        "pages_per_sec_4N": results[n4]["pages_per_sec"],
    }))


if __name__ == "__main__":
    main()
