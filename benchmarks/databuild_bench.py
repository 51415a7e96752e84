"""Reproducible corpus-build throughput benchmark (dialog-hours/min).

Measures the full DataBuilderNX pipeline — energy VAD, two-party turn
segmentation, ignore-mask assembly, window generation, manifest JSON
emission (SURVEY.md §2.4; reference databuild_nx.py:159-442) — over a
synthetic corpus, and reports corpus dialog-hours processed per minute
of wall clock. This is the BASELINE.md "full databuild" row's
denominator-free metric (the reference path needs ffmpeg+mediapipe
binaries and is unmeasurable here; see BASELINE.md).

Usage: python benchmarks/databuild_bench.py [--sessions 8] [--seconds 600]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.fixtures import DATA_CFG, make_synthetic_corpus  # noqa: E402

from multimodalreactiongeneration_tpu.data.databuild_nx import (  # noqa: E402
    DataBuilderNX,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--n-jobs", type=int, default=1)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="mrgen-dbbench-")
    try:
        corpus = make_synthetic_corpus(
            os.path.join(root, "corpus"),
            n_sessions=args.sessions,
            seconds=args.seconds,
        )
        cache = os.path.join(root, "cache")
        cfg = dict(DATA_CFG, data_dir=corpus, no_cache_build=True)

        def run():
            return DataBuilderNX(cfg, cache_root=cache, n_jobs=args.n_jobs)

        if args.profile:
            import cProfile
            import pstats

            prof = cProfile.Profile()
            t0 = time.perf_counter()
            builder = prof.runcall(run)
            dt = time.perf_counter() - t0
            pstats.Stats(prof).sort_stats("cumulative").print_stats(25)
        else:
            t0 = time.perf_counter()
            builder = run()
            dt = time.perf_counter() - t0

        n_manifests = sum(
            len(files)
            for _, _, files in os.walk(builder.data_site)
        )
        dialog_hours = args.sessions * args.seconds / 3600.0
        print(
            json.dumps(
                {
                    "metric": "databuild_dialog_hours_per_min",
                    "value": round(dialog_hours / (dt / 60.0), 2),
                    "unit": "dialog-hours/min",
                    "wall_s": round(dt, 2),
                    "sessions": args.sessions,
                    "manifests": n_manifests,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
