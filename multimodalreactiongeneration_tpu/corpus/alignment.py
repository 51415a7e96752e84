"""Session audio/video time alignment.

Behavior-matched to /root/reference/mr_gen/utils/data_analysis/
data_alignment.py:230-287 (alignment): estimate the sample shift between
each mono channel and the session mix via cross-correlation, then trim
every stream to the common span. The O(N*W) Python grid search becomes
the jitted FFT kernel in ops/xcorr.py.

Skip-if-populated resume matches the reference's --overwrite gate
(:325-329). Video trimming is delegated to the optional video layer
(infer/video.py) when a movie + decoder are present.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

from multimodalreactiongeneration_tpu.ops.xcorr import align_shift
from multimodalreactiongeneration_tpu.utils.wavio import read_wav, write_wav


def align_session(
    session_dir: str,
    output_dir: str,
    mix_name: str = "pair.wav",
    overwrite: bool = False,
) -> Optional[Dict[str, int]]:
    """Align comp/host mono wavs against the session mix and trim.

    Returns {"comp": shift, "host": shift} in samples (positive: channel
    starts later than the mix), or None if skipped.
    """
    if os.path.isdir(output_dir) and os.listdir(output_dir) and not overwrite:
        return None
    os.makedirs(output_dir, exist_ok=True)

    mix, sr = read_wav(os.path.join(session_dir, mix_name))
    mix = mix.mean(axis=0)  # mono reference
    shifts: Dict[str, int] = {}
    waves = {}
    for who in ("comp", "host"):
        wav, sr_w = read_wav(os.path.join(session_dir, f"{who}.wav"))
        assert sr_w == sr, "sample rates must match for alignment"
        waves[who] = wav[0]
        shifts[who] = align_shift(mix, wav[0], sr)

    # trim all streams to the common span. A channel delayed by ``shift``
    # has its content for mix time m at channel[m + shift]; the earliest
    # mix time representable in every stream is max(0, -min(shifts)).
    start_mix = max(0, *(-s for s in shifts.values()))
    spans = [len(mix) - start_mix]
    for who in ("comp", "host"):
        start_ch = start_mix + shifts[who]
        if start_ch < 0:
            raise ValueError(f"{who}: negative aligned start {start_ch}")
        spans.append(len(waves[who]) - start_ch)
    common = min(spans)

    for who in ("comp", "host"):
        start_ch = start_mix + shifts[who]
        write_wav(
            os.path.join(output_dir, f"{who}.wav"),
            waves[who][None, start_ch : start_ch + common],
            sr,
        )
    write_wav(
        os.path.join(output_dir, mix_name),
        mix[None, start_mix : start_mix + common],
        sr,
    )
    with open(os.path.join(output_dir, "alignment.json"), "w") as f:
        json.dump({"shifts": shifts, "start_mix": start_mix, "span": common}, f)
    return shifts


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--target", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)
    total = 0.0
    for session in sorted(os.listdir(args.target)):
        sdir = os.path.join(args.target, session)
        if not os.path.isdir(sdir):
            continue
        out = os.path.join(args.output, session)
        shifts = align_session(sdir, out, overwrite=args.overwrite)
        if shifts is not None:
            wav, sr = read_wav(os.path.join(out, "comp.wav"))
            total += wav.shape[1] / sr / 3600
            print(f"{session}: shifts={shifts}")
    print(f"aligned corpus hours: {total:.2f}")


if __name__ == "__main__":
    main()
