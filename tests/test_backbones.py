"""Alternative backbone contract tests: every registry entry emits the
multi-stage multi-level feature-list shape the query path expects."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.models.backbones import (BACKBONES, HRNetV2_W18_small_v2,
                                           HRNetV2_W18_small_v2_balance_last,
                                           Yolov4Filters)


def test_hrnet_balance_last_contract():
    net = HRNetV2_W18_small_v2_balance_last()
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    # single stage, single level, 256 channels at 1/4 resolution (+2 from
    # the reference's quirky padded 1x1 last conv, HRNetFilters.py:299)
    assert len(out) == 1 and len(out[0]) == 1
    assert out[0][0].shape == (1, 18, 18, 256)


def test_hrnet_multiscale_contract():
    net = HRNetV2_W18_small_v2()
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert len(out) == 1 and len(out[0]) == 4
    shapes = [o.shape for o in out[0]]
    assert shapes[0] == (1, 16, 16, 18)
    assert shapes[3] == (1, 2, 2, 144)


def test_yolov4_contract():
    net = Yolov4Filters()
    x = jnp.zeros((1, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    # 3 stages x 1 level, 256 ch at /8, /16, /32 (Yolov4Filters.py:405-416)
    assert len(out) == 3
    assert out[0][0].shape == (1, 16, 16, 256)
    assert out[1][0].shape == (1, 8, 8, 256)
    assert out[2][0].shape == (1, 4, 4, 256)


def test_registry_complete():
    expected = {"PIFuHGFilters", "PIFuResBlkFilters", "Yolov4Filters",
                "HRNetV2_W18_small_v2", "HRNetV2_W18_small_v2_balance",
                "HRNetV2_W18_small_v2_balance_gn32",
                "HRNetV2_W18_small_v2_balance_last",
                "HRNetV2_W18_small_v2_balance_v2",
                "HRNetV2_W18_small_v2_deeper"}
    assert expected <= set(BACKBONES)
