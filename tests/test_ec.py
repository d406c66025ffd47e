import random

import jax.numpy as jnp
import numpy as np
import pytest

from taiga_tpu.crypto.curves import PallasPoint, VestaPoint
from taiga_tpu.crypto.fields import Fp, Fq
from taiga_tpu.ops import ec, limbs as L, msm

rng = random.Random(0xECEC)


def _rand_points(curve, n):
    g = curve.generator()
    return [g * (rng.getrandbits(100) + 1) for _ in range(n)]


@pytest.mark.parametrize("curve,field", [(PallasPoint, "fp"), (VestaPoint, "fq")])
def test_ec_add_double_matches_host(curve, field):
    spec = L.FP if field == "fp" else L.FQ
    pts_a = _rand_points(curve, 6) + [curve.identity(), curve.generator()]
    pts_b = _rand_points(curve, 6) + [curve.generator(), curve.generator()]
    # include P + P (double path) and P + (-P) (cancellation)
    pts_a.append(pts_a[0])
    pts_b.append(pts_a[0])
    pts_a.append(pts_a[1])
    pts_b.append(-pts_a[1])
    a = ec.points_to_device(pts_a)
    b = ec.points_to_device(pts_b)
    out = ec.ec_add(tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b)), spec)
    got = ec.points_from_device(out, curve)
    exp = [x + y for x, y in zip(pts_a, pts_b)]
    assert got == exp

    dout = ec.ec_double(tuple(map(jnp.asarray, a)), spec)
    dgot = ec.points_from_device(dout, curve)
    assert dgot == [x.double() for x in pts_a]


def test_points_roundtrip():
    pts = _rand_points(VestaPoint, 4) + [VestaPoint.identity()]
    arr = ec.points_to_device(pts)
    back = ec.points_from_device(arr, VestaPoint)
    assert back == pts


@pytest.mark.parametrize("curve,field", [(VestaPoint, "fq"), (PallasPoint, "fp")])
def test_msm_matches_host(curve, field):
    n = 32
    pts = _rand_points(curve, n)
    scalars = [rng.getrandbits(255) % curve.SCALAR.MODULUS for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    px, py, pz = map(jnp.asarray, ec.points_to_device(pts))
    sl = jnp.asarray(msm.scalars_to_limbs(scalars))
    out = msm.msm(px, py, pz, sl, field=field)
    got = ec.points_from_device((out[0][None], out[1][None], out[2][None]), curve)[0]
    exp = msm.msm_host(pts, scalars)
    assert got == exp


def test_msm_multi_matches_per_column():
    """Batched multi-column MSM (shared point set) vs per-column host MSM.
    Small shapes + 4-bit windows so the XLA-CPU compile stays cheap."""
    n, ncols = 64, 3
    pts = _rand_points(VestaPoint, n)
    cols = []
    for ci in range(ncols):
        s = [rng.getrandbits(255) % VestaPoint.SCALAR.MODULUS for _ in range(n)]
        s[ci] = 0  # exercise zero-digit masking per column
        cols.append(s)
    px, py, pz = map(jnp.asarray, ec.points_to_device(pts))
    sl = jnp.stack([jnp.asarray(msm.scalars_to_limbs(s)) for s in cols])
    out = msm._msm_multi_device(px, py, pz, sl, field="fq", c=4)
    got = ec.points_from_device((out[:, 0], out[:, 1], out[:, 2]), VestaPoint)
    exp = [msm.msm_host(pts, s) for s in cols]
    assert got == exp


def test_msm_all_zero_scalars():
    n = 8
    pts = _rand_points(VestaPoint, n)
    px, py, pz = map(jnp.asarray, ec.points_to_device(pts))
    sl = jnp.asarray(msm.scalars_to_limbs([0] * n))
    out = msm.msm(px, py, pz, sl, field="fq")
    got = ec.points_from_device((out[0][None], out[1][None], out[2][None]), VestaPoint)[0]
    assert got.is_identity()
