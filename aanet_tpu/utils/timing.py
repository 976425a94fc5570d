"""Execution-forcing timing for the remote (axon tunnel) TPU backend.

Why this exists: on this backend `jax.block_until_ready` returns without
forcing device execution — a dispatch-time clock. Round 1-4 benches built
on it reported physically impossible numbers (e.g. an 8.8-TFLOP matmul
chain "completing" in 0.02 ms, implying 356 PFLOP/s on a ~197 TFLOP/s
chip). The round-4 "first readback poisons the session into ~120 ms/call
eager mode" narrative (docs/PERF_r04.md §4) had it backwards: a
device-to-host readback is the only operation that *forces* execution
here, and the ~120 ms/call observed after one was the true per-call cost
(real latency + tunnel round-trip).

Honest protocol (anchored on the reference's, whose final `.cpu()`
readback is what made the V100 numbers real — `inference.py:164-175`):

  1. Run K iterations of the workload inside ONE jitted `lax.scan` whose
     carry perturbs each iteration's input by ~1e-12x the previous
     output, so XLA cannot CSE or reorder the K calls and the chain is
     strictly sequential on-device.
  2. Fetch ONE scalar at the end (`float(...)` — the execution-forcing
     readback), so exactly one tunnel round-trip is paid.
  3. latency = (wall - rtt) / K, with rtt measured on a trivial program.

  A physics guard (`check_physical`) then rejects any measurement whose
  implied FLOP/s exceeds the chip's matmul roofline measured *with the
  same protocol* — impossible numbers raise instead of being recorded.
"""
from __future__ import annotations

import functools
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _tree_perturb(args, eps):
    """Add a traced ~0 scalar to every float leaf (defeats CSE across scan
    iterations without changing numerics beyond 1 ulp)."""
    def add(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
            return x + eps.astype(x.dtype)
        return x
    return jax.tree_util.tree_map(add, args)


def _first_scalar(out):
    """Collapse the workload output to one scalar for the scan carry.

    Uses a MEAN over every float leaf, not an element extract: slicing a
    single element lets XLA propagate the slice back through elementwise
    producers (and even shrink a gather to one index), silently deleting
    the work being timed — a reduction forces every element to exist."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(out)
        if isinstance(l, jax.Array) and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    total = jnp.float32(0.0)
    for l in leaves:
        total = total + jnp.mean(l.astype(jnp.float32))
    return total


def make_scan_runner(fn: Callable, n_iters: int) -> Callable:
    """Jit K sequential, data-dependent invocations of `fn(*args)` with a
    single f32 scalar output. Returned callable: runner(*args) -> Array."""

    @jax.jit
    def runner(*args):
        def body(carry, _):
            out = fn(*_tree_perturb(args, carry * 1e-12))
            return _first_scalar(out), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return carry

    return runner


@functools.lru_cache(maxsize=1)
def measure_rtt(n: int = 5) -> float:
    """Seconds for one execution-forced round-trip of a trivial program."""
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(tiny(x))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(tiny(x))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_latency_s(
    fn: Callable,
    args: Sequence,
    *,
    n_iters: int = 8,
    n_repeats: int = 2,
    warmup: bool = True,
) -> float:
    """True per-call seconds of `fn(*args)` via the scan-of-K protocol.

    Returns the best (min) over `n_repeats` timed windows — the machine's
    capability; the tunnel has transient multi-x degraded windows.
    """
    runner = make_scan_runner(fn, n_iters)
    rtt = measure_rtt()
    if warmup:
        float(runner(*args))  # compile + one full execution
    best = float("inf")
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        float(runner(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / n_iters


@functools.lru_cache(maxsize=4)
def matmul_roofline_tflops(dtype_name: str = "bfloat16", dim: int = 4096,
                           chain: int = 192) -> float:
    """Measured peak matmul TFLOP/s with an execution-forcing protocol.

    Unlike `scan_latency_s`'s scalar-carry (fine for nonlinear models,
    but a *linear* body lets XLA distribute `(x + c) @ b` and hoist the
    loop-invariant part), the chain here carries the FULL matrix:
    x_{i+1} = x_i @ b — strictly sequential, no algebraic escape. The
    chain is long (~100+ ms of compute) so the one-RTT subtraction is
    noise-free. This is the physics ceiling every model measurement is
    checked against; on this chip (TPU v5 lite) expect <= ~200 TF/s."""
    dtype = jnp.dtype(dtype_name)
    a = jax.random.normal(jax.random.PRNGKey(0), (dim, dim), jnp.float32)
    a = a.astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (dim, dim), jnp.float32)
    b = (b / (dim ** 0.5)).astype(dtype)  # spectral norm ~2: stays finite

    @jax.jit
    def run(x0, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=dtype), None
        x, _ = jax.lax.scan(body, x0, None, length=chain)
        return x.ravel()[0].astype(jnp.float32)

    rtt = measure_rtt()
    float(run(a, b))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(a, b))
        best = min(best, time.perf_counter() - t0)
    sec = max(best - rtt, 1e-9) / chain
    flops = 2.0 * dim * dim * dim
    return flops / sec / 1e12


def check_physical(flops: float, seconds: float, *, dtype_name: str = "bfloat16",
                   slack: float = 1.05) -> float:
    """Raise if `flops` in `seconds` implies more than the measured
    roofline (x slack). Returns the implied TFLOP/s."""
    implied = flops / seconds / 1e12
    roof = matmul_roofline_tflops(dtype_name)
    if implied > roof * slack:
        raise RuntimeError(
            f"physically impossible measurement: {implied:.1f} TFLOP/s implied "
            f"but the chip's measured matmul roofline is {roof:.1f} TFLOP/s "
            f"({flops / 1e9:.1f} GFLOP in {seconds * 1e3:.3f} ms). The clock is "
            "not forcing execution."
        )
    return implied
