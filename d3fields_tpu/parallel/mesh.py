"""Device-mesh construction and placement helpers.

The reference's only multi-device code is NCCL DDP inside XMem training
(``XMem/train.py:25,39-41``); its runtime is single-GPU. Here scale-out is
first-class: a (dp, tp) ``jax.sharding.Mesh`` over ICI, with NamedSharding
helpers for the two workloads that shard —

- field queries: the point axis over ``dp`` (inference scale-out);
- XMem training: the batch axis over ``dp`` (the DDP equivalent);
- tensor-parallel hidden/head dims over ``tp`` for the transformer
  backbones (optional, see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def available_devices(min_devices: int = 1):
    """Devices for mesh building, falling back to the virtual CPU mesh when
    the platform plugin pins a single chip (see tests/conftest.py).

    The force-count flag must be in the environment BEFORE the cpu client is
    first created (clients are cached); set it before touching jax.devices,
    which initializes every backend. If the cpu client already exists with
    too few devices, fail with an actionable message instead of a reshape
    error downstream."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={min_devices}"
        ).strip()
    import jax

    devices = jax.devices()
    if len(devices) < min_devices:
        devices = jax.devices("cpu")
    if len(devices) < min_devices:
        raise RuntimeError(
            f"need {min_devices} devices but only {len(devices)} exist and "
            "the cpu backend was already initialized without "
            "--xla_force_host_platform_device_count; set XLA_FLAGS before "
            "the first jax call (tests/conftest.py pattern)"
        )
    return devices


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host runtime initialization.

    The reference's ``torch.distributed.init_process_group(backend="nccl")``
    + rank/world-size plumbing (``XMem/train.py:25,39-41``), rebuilt on
    ``jax.distributed``: after this, ``jax.devices()`` spans every host's
    chips and mesh axes laid over them communicate over ICI/DCN.

    Explicit arguments win; otherwise cluster auto-detection (TPU metadata,
    ``JAX_COORDINATOR_ADDRESS``, an srun step with >1 task) is attempted.
    Returns True when a multi-process runtime was initialized, False for
    the single-process fallback (the common local case — callers need no
    branch). Must be called BEFORE the first JAX computation: jax refuses
    to initialize the distributed runtime once a backend is live.
    """
    explicit = coordinator_address is not None
    auto = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    # TPU_WORKER_HOSTNAMES signals multi-host only with >1 hostname:
    # single-chip tunnel runtimes set it to just "localhost", and
    # initializing the distributed runtime there fails (no coordinator)
    tpu_hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
                 if h.strip()]
    auto = auto or len(tpu_hosts) > 1
    # SLURM: a bare SLURM_JOB_ID (any sbatch/salloc shell) is NOT a
    # multi-process launch; require an srun step with >1 task before
    # handing off to jax's SlurmCluster auto-detection.
    slurm = (
        os.environ.get("SLURM_STEP_NODELIST")
        and int(os.environ.get("SLURM_NTASKS", "1")) > 1
    )
    if not explicit and not auto and not slurm:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              axis_names: Tuple[str, str] = ("dp", "tp")):
    """(dp x tp) mesh; dp defaults to all devices / tp."""
    import jax
    from jax.sharding import Mesh

    n = dp * tp if dp else None
    devices = available_devices(n or 1)
    if dp is None:
        dp = len(devices) // tp
    devices = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, axis_names)


def shard_leading(mesh, x, axis: str = "dp"):
    """Place an array with its leading axis split over ``axis``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_leading_checked(mesh, x, axis: str = "dp", what: str = "views"):
    """:func:`shard_leading` with the divisibility check every
    ``shard_views`` implementation needs (Dinov2Backbone, XMemCore,
    GroundingDinoDetector, SamPredictor): the leading axis must split
    evenly over the mesh axis, and the error says so in workload terms."""
    n = np.shape(x)[0]
    if n % mesh.shape[axis]:
        raise ValueError(
            f"{what} count {n} not divisible by mesh axis {axis!r} of "
            f"size {mesh.shape[axis]}"
        )
    return shard_leading(mesh, x, axis)


def replicate(mesh, tree):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
