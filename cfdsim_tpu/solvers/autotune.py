"""First-call autotuned dispatch for the exact Neumann Poisson solve.

Round 2 measured three exact clamped-edge solvers with hardware-dependent
winners (BENCHNOTES "falloff: root cause"): the rfft-based DCT (wins on
this rig), the half-FFT packed DCT (cheaper FFTs, HBM-bound extras), and
the matmul fast-diagonalization (MXU-bound; the right answer on hardware
with strong matmul vs FFT).  Hand-picking per rig does not survive a
hardware change, so ``best_dct_variant`` times all variants on the live
backend at first use per (backend, shape) and caches the winner —
in-process and on disk (~/.cache/cfdsim_tpu/autotune.json, override dir
with CFDSIM_AUTOTUNE_CACHE; force a variant with CFDSIM_DCT_VARIANT).

Timing uses the marginal-scan-chain method (CLAUDE.md): each candidate
is jitted as a ``lax.scan`` chain of K solves and the marginal per-solve
time is the slope between two chain lengths, which cancels the relay
dispatch overhead of this rig's tunneled TPU.  All variants solve the
same problem exactly (same nullspace convention), so the dispatch never
changes semantics — only speed.  (VERDICT r2 item 5.)
"""

from __future__ import annotations

import functools
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_MEM: dict[str, str] = {}
_VARIANTS = ("rfft", "rfft2", "rfft_split", "packed", "matmul")
# deeper radix-2 peels (internal FFT length n/4, n/8) only make sense
# where the base FFT is superlinear — past the 2048 cliff
_DEEP_VARIANTS = ("rfft_split4", "rfft_split8")


def _variants_for(shape) -> tuple[str, ...]:
    if min(shape) >= 4096:
        return _VARIANTS + _DEEP_VARIANTS
    return _VARIANTS


def _cache_path() -> Path:
    base = os.environ.get("CFDSIM_AUTOTUNE_CACHE")
    if base:
        return Path(base) / "autotune.json"
    return Path.home() / ".cache" / "cfdsim_tpu" / "autotune.json"


def _load_disk() -> dict:
    try:
        return json.loads(_cache_path().read_text())
    except (OSError, ValueError):
        return {}


def _store_disk(key: str, value: str, timings: dict,
                fallback: list | None = None) -> None:
    path = _cache_path()
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        data = _load_disk()
        entry = {"variant": value, "ms": timings}
        if fallback:
            # these ms values are constant-inclusive upper bounds, not
            # marginals (shared-chip variance inverted the slope)
            entry["fallback_upper_bound"] = sorted(fallback)
        data[key] = entry
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
    except OSError:
        pass  # read-only home: in-process cache still applies


@functools.lru_cache(maxsize=None)
def matmul_dct_solver(m: int, n: int, dx: float, dy: float):
    """Uniform-spacing fast-diagonalization solver: the clamped-edge FD
    operator in the DCT eigenbasis as 4 dense MXU matmuls (the uniform
    special case of solvers/fdm.make_fdm_solver; same mean-free
    nullspace convention as the FFT DCT solvers).  The eigenbasis is the
    analytic DCT-II cosine basis — O(n²) to build vs the numeric eig's
    O(n³), which stalled the 4096² tune for minutes on this host."""
    from cfdsim_tpu.solvers.fdm import make_fdm_solver, uniform_neumann_eigs

    return make_fdm_solver(
        np.full(n, dx), np.full(m, dy),
        eigs=(uniform_neumann_eigs(n, dx), uniform_neumann_eigs(m, dy)))


def _candidate(variant: str, shape, dx: float, dy: float):
    from cfdsim_tpu.solvers.poisson import solve_poisson_neumann_dct

    if variant == "matmul":
        solver = matmul_dct_solver(shape[0], shape[1], dx, dy)
        return lambda rhs: solver(rhs)
    return lambda rhs: solve_poisson_neumann_dct(rhs, dx, dy,
                                                 variant=variant)


def _time_marginal(fn, rhs, k_short: int = 2, k_long: int = 10,
                   reps: int = 3) -> float:
    """Marginal seconds per solve from the slope between two jitted scan
    chains (relay/dispatch overhead cancels in the difference)."""

    def chain(k):
        def body(r, _):
            p = fn(r)
            # keep the chain non-constant-foldable and bounded
            return p - jnp.mean(p), None

        return jax.jit(lambda r: jax.lax.scan(body, r, None, length=k)[0])

    f_s = chain(k_short)
    f_l = chain(k_long)
    float(jnp.sum(f_s(rhs)))  # compile + warm
    float(jnp.sum(f_l(rhs)))

    def once(f):
        t0 = time.perf_counter()
        float(jnp.sum(f(rhs)))  # scalar fetch = the barrier on axon
        return time.perf_counter() - t0

    # Shared-chip variance corrupts a min-of-mins marginal in BOTH
    # directions: t_long < t_short inverts it (the old fake-zero bug,
    # ADVICE r3), and a lucky t_long against an unlucky t_short once
    # published a 15x-too-fast winner (round 4: the v3 1024² re-time
    # recorded rfft at 0.039 ms — real 0.59 — and cost the headline
    # 2.52e9 -> 1.42e9 until re-timed).  Pair each (t_long, t_short)
    # measurement back-to-back so they see the same chip weather, and
    # take the MEDIAN of the positive paired marginals.
    marginals = []
    for _ in range(3 * reps):
        t_l, t_s = once(f_l), once(f_s)
        if t_l > t_s:
            marginals.append((t_l - t_s) / (k_long - k_short))
        if len(marginals) >= reps:
            break
    if marginals:
        return float(np.median(marginals)), False
    # every pairing inverted: fall back to the long-chain average — a
    # conservative upper bound (it still carries the per-call dispatch
    # constant, ~100 ms on this rig's relay) flagged to the caller so the
    # winner selection and the cached timings record it (ADVICE r3).
    return t_l / k_long, True


def measure_dct_variants(shape, dx: float, dy: float) -> tuple[dict, list]:
    """Time every exact variant on the live backend → ({variant: ms},
    [variants whose timing is a constant-inclusive upper bound])."""
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    out, fallback = {}, []
    for v in _variants_for(shape):
        try:
            t, is_ub = _time_marginal(_candidate(v, shape, dx, dy), rhs)
        except Exception:  # pragma: no cover - variant unsupported here
            continue
        out[v] = t * 1e3
        if is_ub:
            fallback.append(v)
    return out, fallback


def _key(shape) -> str:
    # v3: the rfft_split half-length-FFT variant joined in round 4
    # (v2 added rfft2) — bumping the key re-times stale cache entries.
    # ≥4096 shapes carry a v4 key: the deep-split candidates joined.
    # v5 (sub-4096): re-time entries recorded by the corruptible
    # min-of-mins marginal (the v3 1024² entry published a 15x-too-fast
    # fluke winner — see _time_marginal).
    v = "v4" if min(shape) >= 4096 else "v5"
    return f"{jax.default_backend()}|dct2d.{v}|{shape[0]}x{shape[1]}"


def cached_dct_variant(shape) -> str | None:
    """Cache-only lookup (env force > in-process > disk); None on miss.
    Never runs device code — safe to call from inside a jit trace."""
    forced = os.environ.get("CFDSIM_DCT_VARIANT")
    if forced:
        return forced
    key = _key(shape)
    if key in _MEM:
        return _MEM[key]
    disk = _load_disk().get(key)
    if isinstance(disk, dict) and disk.get("variant") in (
            _VARIANTS + _DEEP_VARIANTS):
        _MEM[key] = disk["variant"]
        return _MEM[key]
    return None


def best_dct_variant(shape, dx: float, dy: float) -> str:
    """The fastest exact DCT-solve variant for this (backend, shape):
    cached in process and on disk; measured once on a miss.

    Timing launches its own jitted chains, which DEADLOCKS on the
    tunneled-relay backend when invoked from inside an outer jit trace
    (measured round 3: the round-2 'auto' silently fell back to rfft
    with an empty timing dict for exactly this reason).  Inside a trace
    this returns the cached winner or the rfft default — eager callers
    (model ``make_step`` factories, bench.py) resolve and cache BEFORE
    tracing via ``resolve_poisson_config``."""
    hit = cached_dct_variant(shape)
    if hit:
        return hit
    # trace_state_clean is a private jax path that can move on upgrade
    # (ADVICE r3): if it's gone, assume we might be inside a trace and
    # return the documented in-trace default rather than ImportError.
    try:
        from jax._src import core as _core

        in_trace = not _core.trace_state_clean()
    except Exception:
        return "rfft"
    if in_trace:  # inside jit tracing: no timing
        return "rfft"
    timings, fallback = measure_dct_variants(shape, dx, dy)
    # constant-inclusive fallback timings must not beat clean marginals:
    # prefer the fastest cleanly-measured variant when one exists.
    clean = {k: v for k, v in timings.items() if k not in fallback}
    pool = clean or timings
    winner = min(pool, key=pool.get) if pool else "rfft"
    _MEM[_key(shape)] = winner
    _store_disk(_key(shape), winner,
                {k: round(v, 4) for k, v in timings.items()},
                fallback=fallback)
    return winner


def resolve_poisson_config(pois, shape, dx: float, dy: float):
    """Eagerly pin ``dct_variant="auto"`` to the measured winner at step
    BUILD time (outside jit) so the traced solve never needs to tune.
    Returns ``pois`` unchanged when no resolution is needed."""
    import dataclasses

    if (pois is not None and getattr(pois, "method", None) == "dct"
            and getattr(pois, "dct_variant", None) == "auto"):
        return dataclasses.replace(
            pois, dct_variant=best_dct_variant(shape, dx, dy))
    return pois
