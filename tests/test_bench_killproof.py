"""bench.py must leave a parseable JSON line no matter how it dies.

Round 3's driver bench recorded NOTHING (rc 124, parsed null) because
the median only printed after ALL k samples and the driver's wall clock
expired first. These tests exercise the three defenses added in round 4
— streaming running-median after every sample, a total wall budget, and
a SIGTERM trap that kills the --measure child's process group — using
the MRGEN_BENCH_SELFTEST hook (fake samples, no TPU).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import uuid

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _env(selftest, samples, budget=None, sample_timeout=None):
    env = dict(os.environ)
    sid = uuid.uuid4().hex
    env.update(
        MRGEN_BENCH_SELFTEST=selftest,
        MRGEN_BENCH_SELFTEST_ID=sid,
        MRGEN_BENCH_SAMPLES=str(samples),
    )
    if budget is not None:
        env["MRGEN_BENCH_BUDGET"] = str(budget)
    if sample_timeout is not None:
        env["MRGEN_BENCH_SAMPLE_TIMEOUT"] = str(sample_timeout)
    return env, sid


def _json_lines(stdout):
    return [json.loads(l) for l in stdout.strip().splitlines() if l.startswith("{")]


def _orphan_pids(sid):
    """Processes (not ours) whose environment carries this selftest id."""
    me = os.getpid()
    found = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/environ", "rb") as f:
                if sid.encode() in f.read():
                    found.append(int(pid))
        except OSError:
            continue
    return found


@pytest.mark.slow
def test_running_median_streams_after_every_sample():
    env, _ = _env("0.2:100,0.2:300,0.2:200", samples=3, budget=600)
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr
    recs = _json_lines(proc.stdout)
    # one median line per completed sample; lower-middle on even counts
    assert [r["value"] for r in recs] == [100.0, 100.0, 200.0]


@pytest.mark.slow
def test_budget_stops_sampling_with_best_so_far():
    # each fake sample sleeps 2 s (plus interpreter startup); a tiny
    # budget lets exactly the first sample through, then stops cleanly
    env, _ = _env("2:123,2:999,2:999", samples=3, budget=1)
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr
    recs = _json_lines(proc.stdout)
    assert len(recs) == 1 and recs[0]["value"] == 123.0
    assert "budget exhausted" in proc.stderr


@pytest.mark.slow
def test_sigterm_kills_child_group_and_leaves_last_line():
    # first sample quick, second wedges for 600 s; SIGTERM the parent
    # mid-second-sample: it must exit fast, leave the sample-1 median as
    # the last stdout line, and leave NO orphan --measure child
    env, sid = _env("0.2:42,600:999", samples=2, budget=3600)
    proc = subprocess.Popen(
        [sys.executable, BENCH], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait for sample 1's median line on stdout, then for the wedged
        # sample-2 child to exist
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            ctr = os.path.join(tempfile.gettempdir(), f"mrgen_bench_selftest_{sid}")
            try:
                with open(ctr) as f:
                    if int(f.read()) >= 2:
                        break
            except (FileNotFoundError, ValueError):
                pass
            time.sleep(0.5)
        else:
            pytest.fail("second sample never started")
        time.sleep(1.0)
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 128 + signal.SIGTERM, err
    recs = _json_lines(out)
    assert recs and recs[-1]["value"] == 42.0
    # the --measure child (own session) must not survive as an orphan
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and _orphan_pids(sid):
        time.sleep(0.5)
    assert _orphan_pids(sid) == []
