"""Executed databuild parity: the reference's own DataBuilderNX vs ours.

PARITY.md guarantees that reference-built manifests and ours interchange
("Manifest JSON schema + index arithmetic"). Until round 4 that claim
was verified only by this repo's own tests. Here the reference's actual
code — `mr_gen.databuild.databuild_nx.DataBuilderNX` driving
`get_uttrance_section` (/root/reference/mr_gen/databuild/databuild_nx.py:
159-442, utterance_analysis/speech_segmentation.py:316-425) — is
EXECUTED on a tests/fixtures.py synthetic corpus with its missing deps
stubbed (dfcon directory walker, toolpack parallel launcher, the
torchaudio soundfile loader), and every emitted segment manifest is
asserted JSON-equal to the one our builder wrote for the same corpus.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from multimodalreactiongeneration_tpu.data.databuild_nx import DataBuilderNX
from tests.fixtures import DATA_CFG, make_synthetic_corpus

pytestmark = pytest.mark.slow

REFERENCE = "/root/reference"


class _DummyLogger:
    """logger_gen.py:7 stand-in — module-level so the reference's
    datainfo.pkl dump (databuild_nx.py:155 pickles self incl. logger)
    can serialize it."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **kw: None


def _install_databuild_stubs():
    """Make `mr_gen.databuild.databuild_nx` importable and runnable.

    Reuses benchmarks.torch_baseline's lightning/omegaconf/mr_gen stubs
    (setdefault semantics keep the two compatible in one process), then
    adds the databuild-only deps: dfcon, toolpack, torchaudio's
    soundfile loader, and inert mr_gen.utils members. The reference
    MODULE CODE under test runs unmodified."""
    from benchmarks.torch_baseline import _install_lightning_stub

    _install_lightning_stub()

    import torch

    mr_utils = sys.modules["mr_gen.utils"]
    if not hasattr(mr_utils, "DummyLogger"):
        mr_utils.DummyLogger = _DummyLogger
    # real mr_gen.utils.io pulls FaceAdapter -> mediapipe (absent);
    # databuild_nx only reads ZERO_PADDING (io.py:11)
    io_stub = types.ModuleType("mr_gen.utils.io")
    io_stub.ZERO_PADDING = 5
    sys.modules.setdefault("mr_gen.utils.io", io_stub)

    # bypass mr_gen/databuild/__init__.py (imports databuild.py v1 too);
    # package shell with a real __path__ loads the module under test
    db_pkg = types.ModuleType("mr_gen.databuild")
    db_pkg.__path__ = [os.path.join(REFERENCE, "mr_gen", "databuild")]
    sys.modules.setdefault("mr_gen.databuild", db_pkg)
    ua_pkg = types.ModuleType("mr_gen.databuild.utterance_analysis")
    ua_pkg.__path__ = [
        os.path.join(REFERENCE, "mr_gen", "databuild", "utterance_analysis")
    ]
    sys.modules.setdefault("mr_gen.databuild.utterance_analysis", ua_pkg)

    # torchaudio soundfile backend: float32 [channels, frames] in
    # [-1, 1] (int16 / 32768) + sample rate — same normalization wavio
    # uses, so both builders see identical sample values
    def load(path):
        import wave as wavmod

        with wavmod.open(path, "rb") as w:
            n, sr, c = w.getnframes(), w.getframerate(), w.getnchannels()
            raw = np.frombuffer(w.readframes(n), dtype=np.int16)
        arr = raw.reshape(-1, c).T.astype(np.float32) / 32768.0
        return torch.from_numpy(arr), sr

    ta = types.ModuleType("torchaudio")
    backend = types.ModuleType("torchaudio._backend")
    sndfile = types.ModuleType("torchaudio._backend.soundfile_backend")
    sndfile.load = load
    ta._backend = backend
    backend.soundfile_backend = sndfile
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio._backend", backend)
    sys.modules.setdefault("torchaudio._backend.soundfile_backend", sndfile)

    # dfcon: Directory(root).get_instances(DircFilter()...) -> terminal
    # dirs whose path contains the literal; each exposes get_file_path()
    class _Dirc:
        def __init__(self, path):
            self.path = path

        def get_file_path(self):
            return [
                os.path.join(self.path, f)
                for f in sorted(os.listdir(self.path))
            ]

    class Directory:
        def __init__(self, root):
            self.root = root

        def get_instances(self, dfilter):
            out = []
            for dirpath, dirnames, _ in sorted(os.walk(self.root)):
                if not dirnames and dfilter.literal in os.path.basename(
                    dirpath
                ):
                    out.append(_Dirc(dirpath))
            return out

    class DircFilter:
        def contained_literal(self, lit):
            self.literal = lit
            return self

        def only_terminal(self):
            return self

    dfcon = types.ModuleType("dfcon")
    dfcon.Directory = Directory
    dfcon.DircFilter = DircFilter
    sys.modules.setdefault("dfcon", dfcon)

    # toolpack.parallel.parallel_luncher: sequential here (deterministic
    # and the corpus is tiny); tqdm kwargs ignored
    def parallel_luncher(fn, arg_list, parallel, unpack=False, **kw):
        del parallel, kw
        return [fn(*a) if unpack else fn(a) for a in arg_list]

    toolpack = types.ModuleType("toolpack")
    tp_par = types.ModuleType("toolpack.parallel")
    tp_par.parallel_luncher = parallel_luncher
    toolpack.parallel = tp_par
    sys.modules.setdefault("toolpack", toolpack)
    sys.modules.setdefault("toolpack.parallel", tp_par)


def _manifests(site):
    out = {}
    for f in sorted(os.listdir(site)):
        if not (f.startswith("dataset_") and f.endswith(".json")):
            continue
        with open(os.path.join(site, f), encoding="utf-8") as fh:
            out[f] = json.loads(fh.read())
    return out


def test_reference_databuild_manifests_match_ours(tmp_path, monkeypatch):
    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"), n_sessions=2, seconds=90.0
    )

    ours = DataBuilderNX(
        dict(DATA_CFG, data_dir=corpus), cache_root=str(tmp_path / "ours")
    )
    ours_manifests = _manifests(ours.data_site)
    assert ours_manifests, "our builder emitted no segments"

    _install_databuild_stubs()
    from mr_gen.databuild.databuild_nx import DataBuilderNX as RefBuilder

    # reference caches under a RELATIVE ./data/temp (databuild_nx.py:22)
    monkeypatch.chdir(tmp_path)
    os.makedirs("data/temp", exist_ok=True)
    ref = RefBuilder(dict(DATA_CFG, data_dir=corpus))
    ref_manifests = _manifests(ref.data_site)
    assert ref_manifests, "reference builder emitted no segments"

    # identical segment files: same names (same windows discovered at
    # the same start frames) and line-for-line-equal JSON bodies
    assert sorted(ref_manifests) == sorted(ours_manifests)
    for name, ref_seg in ref_manifests.items():
        assert ours_manifests[name] == ref_seg, name
