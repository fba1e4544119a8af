"""Session-scoped artifact store for fit-once / serve-many queries.

The stored-artifact queries (``bpe_encode_stored``,
``embedding_ivf_topk_stored``, ``incremental_index_dedup``) certify
the production lifecycle: train once, persist a versioned artifact,
resolve latest, load, and serve using ONLY the stored rows. Two r9
findings motivated this module:

- ADVICE (leak): each build created a fresh ``tempfile.mkdtemp`` and
  never removed it, so repeated bench/parity runs accumulated
  parquet directories in /tmp. All artifacts now live under ONE
  per-process root, removed at interpreter exit.
- Verdict watch #4 (fit-vs-serve conflation): the registered queries
  re-trained on every build, so the two slowest bench rows mostly
  measured fit, and the production load-WITHOUT-fit path was never
  the thing timed. ``fit_once`` runs the trainer exactly once per
  (artifact kind, sf_dir) per process and records its wall-clock;
  every later build of the same query resolves + loads + serves from
  the stored rows only. bench.py's best-of-N therefore reports the
  serve path, and prints the recorded fit seconds as a separate
  ``artifact_fit_sec`` field.

At 100 TB the analogue is a model/feature registry: training jobs
write versioned artifact directories, serving queries resolve
"latest" and never retrain. The first build in a process plays the
training job; the rest are the serving fleet.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
import threading
import time
from collections.abc import Callable

_LOCK = threading.Lock()
_ROOT: str | None = None
_FITS: dict[tuple[str, str], str] = {}
_KEY_LOCKS: dict[tuple[str, str], threading.Lock] = {}
_FIT_SECONDS: dict[str, float] = {}


def session_artifacts_dir() -> str:
    """The one per-process artifact root (created lazily, removed at
    interpreter exit — no cross-run /tmp accumulation)."""
    global _ROOT
    with _LOCK:
        if _ROOT is None:
            _ROOT = tempfile.mkdtemp(prefix="spark_graft_artifacts_")
            atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        return _ROOT


def fit_once(
    kind: str, sf_dir: str, fit_fn: Callable[[str], object]
) -> str:
    """Run ``fit_fn(artifacts_dir)`` once per (kind, sf_dir) per
    process and return the artifact directory; later calls skip the
    fit and return the same directory (the serve path resolves
    latest-version inside it). Fit wall-clock is recorded for
    :func:`fit_seconds`.

    Exactly-once under concurrency: a per-key lock is HELD ACROSS the
    fit (a check-then-act gap here would let two simultaneous first
    builds race overwrite-mode writes into the same deterministic
    directory); concurrent callers for the same key block until the
    first fit lands, different keys never contend.
    """
    key = (kind, os.path.abspath(sf_dir))
    with _LOCK:
        cached = _FITS.get(key)
        if cached is not None:
            return cached
        klock = _KEY_LOCKS.setdefault(key, threading.Lock())
    with klock:
        with _LOCK:
            cached = _FITS.get(key)
        if cached is not None:
            return cached
        tag = hashlib.md5(key[1].encode()).hexdigest()[:8]
        art_dir = os.path.join(session_artifacts_dir(), f"{kind}_{tag}")
        os.makedirs(art_dir, exist_ok=True)
        t0 = time.perf_counter()
        fit_fn(art_dir)
        dt = time.perf_counter() - t0
        base = os.path.basename(key[1].rstrip("/"))
        with _LOCK:
            _FITS[key] = art_dir
            report_key = f"{kind}@{base}"
            # two roots sharing a leaf name (e.g. testdata/sf0.1 and
            # .scaledata/sf0.1) must not silently overwrite each
            # other's fit time — disambiguate the later one.
            if report_key in _FIT_SECONDS:
                report_key = f"{kind}@{base}#{tag}"
            _FIT_SECONDS[report_key] = round(dt, 3)
        return art_dir


def fit_seconds() -> dict[str, float]:
    """Fit wall-clock per artifact kind recorded this process — the
    'fit cost reported once separately' half of the r10 contract."""
    with _LOCK:
        return dict(_FIT_SECONDS)


def _natural_version_key(name: str) -> tuple:
    """Sort key treating digit runs as integers, so numeric versions
    resolve correctly (plain lexicographic sort put v10 before v9 —
    r9 ADVICE). Dated and zero-padded versions sort identically
    under both orders. The raw name is the FINAL tiebreak so names
    whose digit-split keys collide (``v1`` vs ``v0001``) still
    resolve deterministically instead of by os.listdir order."""
    import re

    return (
        [int(s) if s.isdigit() else s for s in re.split(r"(\d+)", name)],
        name,
    )


def latest_artifact(artifacts_dir: str, prefix: str) -> str:
    """Latest-wins artifact resolution shared by every stored-artifact
    consumer: natural-numeric max of ``{prefix}*`` entries, with a
    diagnostic error when none exist."""
    cands = sorted(
        (d for d in os.listdir(artifacts_dir) if d.startswith(prefix)),
        key=_natural_version_key,
    )
    if not cands:
        raise FileNotFoundError(
            f"no '{prefix}*' artifacts under {artifacts_dir}"
        )
    return os.path.join(artifacts_dir, cands[-1])


def reset_for_tests() -> None:
    """Drop the fit cache (tests that need to observe a re-fit)."""
    with _LOCK:
        _FITS.clear()
        _KEY_LOCKS.clear()
        _FIT_SECONDS.clear()
