"""Fused eval SA stage (query+group+folded-MLP+max) vs the unfused path."""

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.ops import pointnet2 as xla_ops
from istnet_tpu.ops.sa_fused_pallas import sa_msg_fused_pallas

RADII, NS = (0.15, 0.4), (4, 8)


def _random_folded(rng, c_in, channels):
    layers = []
    for c_out in channels:
        w = rng.randn(c_in, c_out).astype(np.float32) * 0.2
        b = rng.randn(c_out).astype(np.float32) * 0.1
        layers.append((jnp.asarray(w), jnp.asarray(b)))
        c_in = c_out
    return tuple(layers)


def _reference(radii, ns, xyz, cent, feats, folded):
    """Unfused composition mirroring the kernel's dtype discipline."""
    grouped = xla_ops.ball_query_group(radii, ns, xyz, cent, feats, True)
    outs = []
    for g, layers in zip(grouped, folded):
        h = g.astype(jnp.bfloat16)
        for li, (w, b) in enumerate(layers):
            z = jnp.dot(h, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        outs.append(jnp.max(jnp.maximum(z, 0.0), axis=2))  # (B, M, c_last)
    return outs


def test_sa_fused_kernel_matches_composition():
    rng = np.random.RandomState(11)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    xyz[1, 200:] += 50.0            # some centroids with no hits
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    feats = jnp.asarray(rng.randn(2, 256, 5).astype(np.float32)
                        ).astype(jnp.bfloat16)
    folded = tuple(_random_folded(rng, 5 + 3, (16, 16, 32)) for _ in RADII)

    got = sa_msg_fused_pallas(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent),
                              feats, folded, interpret=True)
    want = _reference(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent), feats,
                      folded)
    for g, w in zip(got, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_sa_fused_grouping_bit_parity_via_identity_mlp():
    """With a single identity layer the fused kernel reduces to
    relu(max(grouped)) — bitwise equal to the grouping kernel's bf16 output
    when every input value is bf16-exact. Pins that the L1-fused default
    path's extraction (one-hot dots into U = vals @ W1) stays EXACT.

    Coordinates sit on the 2^-8 dyadic grid so that xyz values, their cen
    subtraction, and the identity U are all exact in bf16/f32 — under the
    L1 fusion xyz rounds to bf16 BEFORE the cen subtraction, so continuous
    coords would differ by bf16 ulps (by design, inside the fused path's
    tolerance contract); exact inputs make bit equality a real invariant."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    rng = np.random.RandomState(9)
    xyz = rng.randint(-64, 64, size=(2, 256, 3)).astype(np.float32) / 256.0
    xyz[1, 200:] += 64.0          # dyadic shift: image 1 has no hits
    cent = rng.randint(-64, 64, size=(2, 128, 3)).astype(np.float32) / 256.0
    feats = jnp.asarray(rng.randn(2, 256, 5).astype(np.float32)
                        ).astype(jnp.bfloat16)
    c = 3 + 5
    eye = (jnp.eye(c, dtype=jnp.float32), jnp.zeros((c,), jnp.float32))
    folded = ((eye,), (eye,))

    got = sa_msg_fused_pallas(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent),
                              feats, folded, interpret=True)
    grouped = ball_query_group_pallas(RADII, NS, jnp.asarray(xyz),
                                      jnp.asarray(cent), feats, True,
                                      interpret=True,
                                      out_dtype=jnp.bfloat16)
    for g, gr in zip(got, grouped):
        want = jnp.maximum(jnp.max(gr.astype(jnp.float32), axis=2), 0.0
                           ).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(want, np.float32))


def test_sa_fused_legacy_kernel_bit_parity_continuous(monkeypatch):
    """The legacy two-phase kernel (ISTNET_SA_L1FUSE=0) keeps the stronger
    invariant: bitwise parity with the grouping kernel on CONTINUOUS
    coordinates (it extracts exact f32 rows via the bf16x3 split before
    the MLP)."""
    from istnet_tpu.ops.ball_query_pallas import ball_query_group_pallas

    monkeypatch.setenv("ISTNET_SA_L1FUSE", "0")
    rng = np.random.RandomState(9)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    xyz[1, 200:] += 50.0
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    feats = jnp.asarray(rng.randn(2, 256, 5).astype(np.float32)
                        ).astype(jnp.bfloat16)
    c = 3 + 5
    eye = (jnp.eye(c, dtype=jnp.float32), jnp.zeros((c,), jnp.float32))
    folded = ((eye,), (eye,))

    got = sa_msg_fused_pallas(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent),
                              feats, folded, interpret=True)
    grouped = ball_query_group_pallas(RADII, NS, jnp.asarray(xyz),
                                      jnp.asarray(cent), feats, True,
                                      interpret=True,
                                      out_dtype=jnp.bfloat16)
    for g, gr in zip(got, grouped):
        want = jnp.maximum(jnp.max(gr.astype(jnp.float32), axis=2), 0.0
                           ).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(want, np.float32))


def test_sa_fused_kernel_features_none():
    """Stage-1 form: grouped values are the relative xyz alone."""
    rng = np.random.RandomState(3)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    folded = tuple(_random_folded(rng, 3, (8, 8, 16)) for _ in RADII)
    got = sa_msg_fused_pallas(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent),
                              None, folded, interpret=True)
    want = _reference(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent), None,
                      folded)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_sa_module_fused_path_matches_unfused(monkeypatch):
    """PointnetSAModuleMSG's eval fused path (BN folding + variables access)
    equals the unfused eval path up to bf16 weight rounding. The fused gate
    requires the bf16 compute policy (an f32 eval must never silently run
    the bf16 kernel), so both applies run under bf16."""
    from istnet_tpu import ops
    from istnet_tpu.nn import precision
    from istnet_tpu.nn.pointnet2_msg import PointnetSAModuleMSG

    rng = np.random.RandomState(4)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 128, 6).astype(np.float32))

    sa = PointnetSAModuleMSG(npoint=64, radii=RADII, nsamples=NS,
                             mlps=((8, 8, 16), (8, 8, 16)))
    variables = sa.init({"params": jax.random.PRNGKey(0)}, xyz, feats,
                        train=True)
    # make running stats non-trivial so BN folding is actually exercised
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.1 if x.ndim == 1 else x, variables)

    calls = []

    def fake_fused(radii, nsamples, x, nx, f, folded):
        calls.append(1)
        return sa_msg_fused_pallas(tuple(radii), tuple(nsamples), x, nx,
                                   f, tuple(folded), interpret=True)

    monkeypatch.setattr(ops, "sa_msg_fused", fake_fused)
    old = precision.compute_dtype()
    try:
        precision.set_compute_dtype(jnp.float32)
        sa.apply(variables, xyz, feats, train=False)
        assert not calls, "f32 policy must NOT take the bf16 fused path"

        precision.set_compute_dtype(jnp.bfloat16)
        nxyz_f, feats_f = sa.apply(variables, xyz, feats, train=False)
        assert calls, "bf16 eval should take the fused path"

        monkeypatch.setattr(ops, "sa_msg_fused", lambda *a: None)
        nxyz_u, feats_u = sa.apply(variables, xyz, feats, train=False)
    finally:
        precision.set_compute_dtype(old)

    np.testing.assert_array_equal(np.asarray(nxyz_u), np.asarray(nxyz_f))
    assert feats_f.shape == feats_u.shape
    np.testing.assert_allclose(np.asarray(feats_f, np.float32),
                               np.asarray(feats_u, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_sa_fused_t_l1_features_none_matches_composition():
    """The transposed stage-1 L1 kernel (sa_msg_fused_t_l1_pallas) equals
    the unfused composition within the fused-path tolerance contract."""
    from istnet_tpu.ops.sa_fused_pallas import sa_msg_fused_t_l1_pallas

    rng = np.random.RandomState(3)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    xyz[1, 200:] += 50.0            # no-hit rows exercised
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    folded = tuple(_random_folded(rng, 3, (8, 8, 16)) for _ in RADII)
    got = sa_msg_fused_t_l1_pallas(RADII, NS, jnp.asarray(xyz),
                                   jnp.asarray(cent), folded, interpret=True)
    want = _reference(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent), None,
                      folded)
    for g, w in zip(got, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_sa_fused_t_l1_single_layer():
    """nlayers == 1 register-max path of the transposed stage-1 kernel."""
    from istnet_tpu.ops.sa_fused_pallas import sa_msg_fused_t_l1_pallas

    rng = np.random.RandomState(5)
    xyz = np.asarray(rng.randn(2, 256, 3), np.float32) * 0.2
    cent = np.asarray(rng.randn(2, 128, 3), np.float32) * 0.2
    folded = tuple(_random_folded(rng, 3, (16,)) for _ in RADII)
    got = sa_msg_fused_t_l1_pallas(RADII, NS, jnp.asarray(xyz),
                                   jnp.asarray(cent), folded, interpret=True)
    want = _reference(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent), None,
                      folded)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_sa_fused_l1_n2048_hillis_steele_path():
    """The L1-fused default kernel on the 2048-pt config's cumsum path
    (N > 1024: make_tri -> None, Hillis-Steele lane rolls)."""
    rng = np.random.RandomState(7)
    xyz = np.asarray(rng.randn(1, 2048, 3), np.float32) * 0.05
    cent = np.asarray(rng.randn(1, 128, 3), np.float32) * 0.05
    feats = jnp.asarray(rng.randn(1, 2048, 5).astype(np.float32)
                        ).astype(jnp.bfloat16)
    folded = tuple(_random_folded(rng, 5 + 3, (8, 16)) for _ in RADII)
    got = sa_msg_fused_pallas(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent),
                              feats, folded, interpret=True)
    want = _reference(RADII, NS, jnp.asarray(xyz), jnp.asarray(cent), feats,
                      folded)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=2e-2, atol=2e-2)
