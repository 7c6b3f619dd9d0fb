"""Trace-time platform gating for device-dependent op implementations.

Several hot ops ship two implementations — a TPU one (Pallas kernel, MXU
matmul reformulation, slim RPN funnel, space-to-depth stem) and an XLA/numpy
oracle twin that CPU tests exercise bit-exactly. Every gate used to carry its
own ``jax.devices()[0].platform`` probe; this module is the single shared
probe plus a scoped kill-switch for Pallas custom calls.

``no_pallas()`` exists for the GSPMD path (parallel/gspmd.py): Pallas
``tpu_custom_call``s have no SPMD partitioning rule, so a step traced for
the XLA auto-partitioner must route NMS/ROIAlign through their pure-XLA
implementations (the explicit shard_map path is fine — there the kernels
run as ordinary per-device programs). Pure-XLA TPU paths (slim RPN,
matmul ROIAlign, s2d stem) stay enabled; the partitioner handles them.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_STATE = threading.local()


def on_tpu() -> bool:
    """Trace-time backend probe shared by every device-dependent gate.

    'axon' is the tunneled-TPU platform name this environment registers.
    Conservative on failure: a down backend means the CPU/oracle paths.
    """
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def inference_compiler_options() -> dict:
    """Per-jit XLA options for the TPU inference graph.

    ``scoped_vmem_limit_kib=32768`` (double the v5e default) lets the fusion
    cost model keep larger conv+elementwise fusions VMEM-resident — measured
    +2.3% on the flagship graph (R101@1024 b32: 228.7 -> 223.6 ms/batch,
    scripts/sweep_xla_options.py; latency-hiding scheduler and 48 MB were
    neutral). Empty off-TPU (XLA:CPU rejects unknown tpu options)."""
    if on_tpu():
        return {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    return {}


def cpu_collective_compiler_options() -> dict:
    """Per-jit XLA:CPU options for multi-device/multi-process collective
    steps on CPU runtimes (virtual-device dryruns, CPU CI, localhost
    multi-process drills). Empty on TPU.

    - collective stuck/terminate timeouts: with N device threads sharing few
      host cores, the first thread at an all-reduce waits while the others
      serially finish per-shard compute — easily past the 20 s warn / 60 s
      SIGABRT defaults (rendezvous.cc), turning runs into scheduling races.
    - single-thread Eigen: every parallel-for otherwise fans out over an
      N-thread pool per device thread on the same cores (measured 8x wall
      blowup in futex/sched_yield sys time on the 8-device dryrun).
    """
    if on_tpu():
        return {}
    return {
        "xla_cpu_collective_call_warn_stuck_seconds": 300,
        "xla_cpu_collective_call_terminate_timeout_seconds": 3600,
        "xla_cpu_multi_thread_eigen": False,
    }


def pallas_allowed() -> bool:
    """False while inside a ``no_pallas()`` scope (checked by the NMS and
    ROIAlign gates in addition to their own env overrides)."""
    return not getattr(_STATE, "no_pallas", False)


@contextmanager
def no_pallas():
    """Disable Pallas custom calls for anything TRACED inside the scope."""
    prev = getattr(_STATE, "no_pallas", False)
    _STATE.no_pallas = True
    try:
        yield
    finally:
        _STATE.no_pallas = prev


def pallas_forced_interpret() -> bool:
    """``MASKRCNN_TPU_PALLAS=interpret`` routes the NMS/ROIAlign gates to the
    Pallas kernels in INTERPRET mode even off-TPU — the CPU-mesh tests use it
    to exercise the exact GSPMD+shard_map kernel wiring the TPU runs."""
    return os.environ.get("MASKRCNN_TPU_PALLAS", "").lower() == "interpret"


def pallas_spmd_info():
    """``(mesh, data_axis)`` of the surrounding :func:`pallas_spmd` scope, or
    None outside one."""
    return getattr(_STATE, "pallas_spmd", None)


@contextmanager
def pallas_spmd(mesh, data_axis: str):
    """Keep Pallas kernels inside a GSPMD-partitioned program.

    ``tpu_custom_call`` has no SPMD partitioning rule, so an auto-partitioned
    (jit + shardings) trace cannot contain one — round 3 priced the resulting
    pure-XLA downgrade at +18% step time (98.0 -> 115.8 ms/step r50@512 b8).
    Both kernels are per-image independent, so inside this scope their
    *batched* call sites (ops/proposal.py, ops/detection.py,
    ops/roi_align.py) wrap themselves in ``jax.shard_map`` over ``data_axis``
    via :func:`spmd_shard_batched` — a manual-partitioning island the
    partitioner treats as per-shard code, kernels intact. Replaces the old
    ``no_pallas()`` routing in parallel/gspmd.py.
    """
    prev = getattr(_STATE, "pallas_spmd", None)
    _STATE.pallas_spmd = (mesh, data_axis)
    try:
        yield
    finally:
        _STATE.pallas_spmd = prev


def spmd_shard_batched(fn, n_batched: int, n_replicated: int = 0):
    """Wrap ``fn`` in ``shard_map`` over the ambient :func:`pallas_spmd`
    scope's data axis; identity outside a scope.

    ``fn``'s first ``n_batched`` positional args (pytrees of arrays with a
    leading batch dim) shard over the data axis, the next ``n_replicated``
    are replicated; every output is batched. ``check_vma=False``: operands
    are data-sharded activations that GSPMD already lays out this way — the
    wrapper changes *partitioning authority* (manual vs auto), not placement,
    and vma tracking through pallas_call/custom_vjp is not supported.
    """
    info = pallas_spmd_info()
    if info is None:
        return fn
    mesh, axis = info
    import jax
    from jax.sharding import PartitionSpec as P

    in_specs = tuple([P(axis)] * n_batched + [P()] * n_replicated)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis), check_vma=False
    )
