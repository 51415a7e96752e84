"""Reproducible corpus-build throughput benchmark (dialog-hours/min).

Measures the full DataBuilderNX pipeline — energy VAD, two-party turn
segmentation, ignore-mask assembly, window generation, manifest JSON
emission (SURVEY.md §2.4; reference databuild_nx.py:159-442) — over a
synthetic corpus, and reports corpus dialog-hours processed per minute
of wall clock. This is the BASELINE.md "full databuild" row's
denominator-free metric (the reference path needs ffmpeg+mediapipe
binaries and is unmeasurable here; see BASELINE.md).

The pipeline is disk-read-bound on a 1-core box, so throughput swings
~2x with page-cache state. The protocol makes that explicit: the build
runs TWICE on the same corpus — the first pass's wav reads populate the
page cache, the second pass measures the cache-warm steady state — and
both numbers are reported (``value`` = warm, the stable one).
``--drop-caches`` additionally empties the kernel page cache before the
first pass (needs root; echo 1 > /proc/sys/vm/drop_caches) so the first
pass is a true cold read instead of "whatever the synthesis left warm".

Usage: python benchmarks/databuild_bench.py [--sessions 8] [--seconds 600]
       [--drop-caches]
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
    ap.add_argument("--drop-caches", action="store_true",
                    help="empty the kernel page cache before the first "
                         "pass (needs root) for a true cold read")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="mrgen-dbbench-")
    try:
        corpus = make_synthetic_corpus(
            os.path.join(root, "corpus"),
            n_sessions=args.sessions,
            seconds=args.seconds,
        )
        cfg = dict(DATA_CFG, data_dir=corpus, no_cache_build=True)

        page_cache_state = "as-is"
        if args.drop_caches:
            try:
                # drop_caches only evicts CLEAN pages; the corpus was
                # written seconds ago, so flush dirty pages first or the
                # "cold" pass reads the still-cached wavs
                os.sync()
                with open("/proc/sys/vm/drop_caches", "w") as f:
                    f.write("1\n")
                page_cache_state = "dropped"
            except OSError as exc:
                print(f"drop_caches unavailable ({exc}); first pass is "
                      "page-cache as-is", file=sys.stderr)

        def run(tag):
            cache = os.path.join(root, f"cache-{tag}")
            return DataBuilderNX(cfg, cache_root=cache, n_jobs=args.n_jobs)

        if args.profile:
            import cProfile
            import pstats

            prof = cProfile.Profile()
            t0 = time.perf_counter()
            builder = prof.runcall(run, "first")
            dt_first = time.perf_counter() - t0
            pstats.Stats(prof).sort_stats("cumulative").print_stats(25)
        else:
            t0 = time.perf_counter()
            builder = run("first")
            dt_first = time.perf_counter() - t0

        # second pass on the now page-cache-warm corpus (fresh build
        # cache dir, so the full pipeline re-runs — only the disk state
        # differs); this is the stable number
        t0 = time.perf_counter()
        builder = run("warm")
        dt_warm = time.perf_counter() - t0

        n_manifests = sum(
            len(files)
            for _, _, files in os.walk(builder.data_site)
        )
        dialog_hours = args.sessions * args.seconds / 3600.0
        print(
            json.dumps(
                {
                    "metric": "databuild_dialog_hours_per_min",
                    "value": round(dialog_hours / (dt_warm / 60.0), 2),
                    "unit": "dialog-hours/min (page-cache warm)",
                    "first_pass_value": round(
                        dialog_hours / (dt_first / 60.0), 2
                    ),
                    "first_pass_page_cache": page_cache_state,
                    "wall_s_warm": round(dt_warm, 2),
                    "wall_s_first": round(dt_first, 2),
                    "sessions": args.sessions,
                    "manifests": n_manifests,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
