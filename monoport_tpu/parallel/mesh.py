"""Device mesh and sharding helpers.

The reference's only parallelism is single-host nn.DataParallel plus manual
2-GPU module placement (SURVEY §2.2). The TPU-native equivalent: a
jax.sharding.Mesh with two logical axes —

  * ``data``   — batch data parallelism (replaces nn.DataParallel,
                 common/trainer.py:15);
  * ``points`` — sharding of the long query-point axis N (the SP-like
                 axis of this workload, SURVEY §5.7): each chip evaluates
                 a slice of the 3D query points against replicated image
                 features; XLA inserts the all-gather/psum over ICI.

Shardings are expressed with NamedSharding/PartitionSpec and handed to
jit; no hand-written collectives are needed on this path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "points"


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, points) mesh over the available devices.

    ``dp`` defaults to the largest power-of-two split that keeps at least
    two point-shards when more than 2 devices are present.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        dp = 1
        while n // dp > 2 and dp * 2 <= n and n % (dp * 2) == 0:
            dp *= 2
    assert n % dp == 0, (n, dp)
    arr = np.asarray(devices).reshape(dp, n // dp)
    return Mesh(arr, (DATA_AXIS, POINT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> dict:
    """Shardings for a training batch dict (see datasets): images are
    data-sharded; points/labels shard both batch and the point axis.
    Extra keys (e.g. 'feat_prior', the frozen-netG features of a netC
    batch) default to data-sharded via make_train_step's dict wrapper."""
    return {
        "images": NamedSharding(mesh, P(DATA_AXIS)),
        "points": NamedSharding(mesh, P(DATA_AXIS, POINT_AXIS)),
        "calibs": NamedSharding(mesh, P(DATA_AXIS)),
        "labels": NamedSharding(mesh, P(DATA_AXIS, POINT_AXIS)),
        "feat_prior": NamedSharding(mesh, P(DATA_AXIS)),
    }
