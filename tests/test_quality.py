"""Quality-regression gate (VERDICT r1 weak #4 / SURVEY.md §4(6)).

Runs the bundled pretrained checkpoints (examples/checkpoints) on the bundled
held-out frames (examples/data) and asserts PSNR floors, so a refactor that
degrades inference quality fails `pytest` without any TPU. Thresholds follow
the VERDICT suggestion (4x >= trilinear + 4 dB, 8x >= trilinear + 2 dB) and
sit well below the measured values (4x: +7.2, 8x: +4.3 at round 2) to avoid
flaking on numerics while still catching real regressions.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpgan_tpu.infer import assemble
from mpgan_tpu.io import uni
from mpgan_tpu.models import generator as G
from mpgan_tpu.utils import metrics

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(HERE, "..", "examples")


def _missing(kind, what):
    """Skip ONLY when the whole bundle is absent (a stripped distribution).

    When `examples/<kind>` exists but a specific artifact is missing, FAIL:
    a quality gate that silently skips in a green suite reads as coverage
    (VERDICT r3 weak #1 — the OOD gate skipped for a full round because the
    checkpoints were bundled but never committed)."""
    if os.path.isdir(os.path.join(EXAMPLES, kind)):
        pytest.fail(f"bundled {kind} present but {what} missing — "
                    f"quality gates must not skip silently")
    pytest.skip(f"examples/{kind} bundle absent")


def _restore(name, template):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(EXAMPLES, "checkpoints", name))
    if not os.path.exists(path):
        _missing("checkpoints", name)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, abstract)


def _load_frame(sim, frame):
    d_dir = os.path.join(EXAMPLES, "data", sim)
    if not os.path.isdir(d_dir):
        _missing("data", sim)
    _, d = uni.readUni(os.path.join(d_dir, f"density_low_{frame:04d}.uni"))
    _, v = uni.readUni(os.path.join(d_dir, f"velocity_low_{frame:04d}.uni"))
    _, gt = uni.readUni(os.path.join(d_dir, f"density_high_{frame:04d}.uni"))
    lr = jnp.asarray(np.concatenate([d, v], axis=-1))
    return d, lr, gt


def _trilinear(d, up):
    z, y, x, _ = d.shape
    return np.asarray(jax.image.resize(
        jnp.asarray(d), (z * up, y * up, x * up, 1), "linear"))


def test_4x_two_pass_bundled_psnr_floor():
    up, stages = 4, 2
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    p1 = _restore("g1_l1", g1.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, 4))))
    p2 = _restore("g2_l1", g2.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16 * up, 4))))
    d, lr, gt = _load_frame("sim_1010", 12)
    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    tri_vol = _trilinear(d, up)
    psnr = assemble.psnr_volume(out, gt)
    tri = assemble.psnr_volume(tri_vol, gt)
    assert psnr >= tri + 4.0, (psnr, tri)
    assert psnr >= 34.0, psnr  # measured 36.8 dB at round 2
    # structure floor: SSIM catches blur/artifact regressions PSNR can hide
    ssim = metrics.ssim_volume(out, gt)
    ssim_tri = metrics.ssim_volume(tri_vol, gt)
    assert ssim >= ssim_tri + 0.02, (ssim, ssim_tri)  # measured +0.036
    assert ssim >= 0.985, ssim  # measured 0.9928


# Every bundled checkpoint must appear in exactly one of these two maps.
# GATED: bundle name -> the test function in THIS module that loads it.
# UNGATED: bundle name -> the documented reason it carries no gate.
# The inventory meta-gate below derives the bundle list from the directory
# (VERDICT r4 weak #1: a hard-coded list let new bundles land ungated), so
# committing a bundle without updating these maps fails the suite.
GATED_CKPTS = {
    "g1_l1": "test_4x_two_pass_bundled_psnr_floor",
    "g2_l1": "test_4x_two_pass_bundled_psnr_floor",
    "g1_gan": "test_4x_gan_ema_demo_pair_psnr_floor",
    "g1_gan8": "test_8x_progressive_bundled_psnr_floor",
    "g2_gan8": "test_8x_progressive_bundled_psnr_floor",
    "g3_l18": "test_8x_progressive_bundled_psnr_floor",
    "g1_div": "test_4x_diverse_model_ood_generalization_floor",
    "g2_div": "test_4x_diverse_model_ood_generalization_floor",
    "g1_l1_4x": "test_4x_canonical_twopass_l1_bundled_floor",
    "g2_l1_4x": "test_4x_canonical_twopass_l1_bundled_floor",
    "g1_ganft_4x": "test_4x_canonical_ganft_bundled_floor",
    "g1_ganft_ema_4x": "test_4x_canonical_ganft_bundled_floor",
    "g1_scratch_4x": "test_4x_canonical_scratch_bundled_floor",
    "g2_scratch_4x": "test_4x_canonical_scratch_bundled_floor",
    "g3_l1p3_4x": "test_4x_canonical_threepass_bundled_floor",
    "g1_l1_8x": "test_8x_canonical_twopass_l1_bundled_floor",
    "g2_l1_8x": "test_8x_canonical_twopass_l1_bundled_floor",
    "g1_ganft_8x": "test_8x_canonical_ganft_bundled_floor",
    "g1_ganft_ema_8x": "test_8x_canonical_ganft_bundled_floor",
    "g1_scratch_8x": "test_8x_canonical_scratch_bundled_floor",
    "g2_scratch_8x": "test_8x_canonical_scratch_bundled_floor",
    "g3_l1p3_8x": "test_8x_canonical_threepass_bundled_floor",
}
UNGATED_CKPTS: dict = {}


def test_bundled_artifacts_inventory_complete():
    """Meta-gate (VERDICT r3 next #1 / r4 next #2): every artifact the
    quality gates load must be committed, and every committed bundle must be
    claimed by a gate (or carry a documented reason in UNGATED_CKPTS), so no
    gate can skip — and no bundle can drift ungated — while the suite stays
    green. A partial `git add examples/` fails HERE with a named path."""
    ckpt_dir = os.path.join(EXAMPLES, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("examples/checkpoints bundle absent")
    bundled = {d for d in os.listdir(ckpt_dir)
               if os.path.isdir(os.path.join(ckpt_dir, d))}
    claimed = set(GATED_CKPTS) | set(UNGATED_CKPTS)
    assert bundled - claimed == set(), (
        f"bundled checkpoints with no quality gate (add to GATED_CKPTS with "
        f"a gate, or UNGATED_CKPTS with a reason): {sorted(bundled - claimed)}")
    missing = sorted(claimed - bundled)
    for name, gate in GATED_CKPTS.items():
        assert gate in globals(), (
            f"GATED_CKPTS[{name!r}] names missing test {gate!r}")
    for name in bundled:
        if not os.listdir(os.path.join(ckpt_dir, name)):
            missing.append(f"checkpoints/{name} (empty)")
    data = [("sim_1010", [12]), ("sim_1010c", [12]), ("sim_2010", [24]),
            ("sim_2010c", [24]), ("sim_3020", [29, 30, 31])]
    for sim, frames in data:
        for f in frames:
            for stem in ("density_low", "velocity_low", "density_high"):
                p = os.path.join(EXAMPLES, "data", sim, f"{stem}_{f:04d}.uni")
                if not os.path.exists(p):
                    missing.append(f"data/{sim}/{stem}_{f:04d}.uni")
    assert not missing, f"bundled quality-gate artifacts missing: {missing}"


def _two_pass_4x(name1, name2, sim, frame, up=4):
    """Shared driver: restore a (pass-1, pass-2) pair at factor ``up``,
    upscale one bundled frame, and return
    (psnr, ssim, trilinear psnr, trilinear ssim)."""
    stages = {4: 2, 8: 3}[up]
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    p1 = _restore(name1, g1.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 4))))
    p2 = _restore(name2, g2.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16 * up, 4))))
    d, lr, gt = _load_frame(sim, frame)
    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    tri_vol = _trilinear(d, up)
    return (assemble.psnr_volume(out, gt), metrics.ssim_volume(out, gt),
            assemble.psnr_volume(tri_vol, gt),
            metrics.ssim_volume(tri_vol, gt))


def test_4x_canonical_twopass_l1_bundled_floor():
    """Gate over the r4 canonical-rerun L1 pair (scripts/canonical_recipe.sh
    runs 0+1, eval row 4x_twopass_l1: 32.42 dB mean over frames 8-48) on the
    bundled canonical-holdout frame (sim_1010c = the REGENERATED sim_1010;
    the r2-era bundled sim_1010 is a different dataset).
    Measured on this frame: 36.08 dB / 0.9904 vs trilinear 29.44 / 0.9575."""
    psnr, ssim, tri, tri_ssim = _two_pass_4x("g1_l1_4x", "g2_l1_4x",
                                             "sim_1010c", 12)
    assert psnr >= tri + 5.0, (psnr, tri)
    assert psnr >= 34.5, psnr
    assert ssim >= tri_ssim + 0.02, (ssim, tri_ssim)
    assert ssim >= 0.985, ssim


def test_4x_canonical_ganft_bundled_floor():
    """Gate over the canonical GAN fine-tune G1 (run 2, hinge + lazy R1 +
    TTUR) and its EMA twin, each through the canonical L1 pass-2.
    Measured on the bundled frame: raw 35.90 / 0.9904, EMA 35.91 / 0.9907."""
    for name in ("g1_ganft_4x", "g1_ganft_ema_4x"):
        psnr, ssim, tri, tri_ssim = _two_pass_4x(name, "g2_l1_4x",
                                                 "sim_1010c", 12)
        assert psnr >= tri + 5.0, (name, psnr, tri)
        assert psnr >= 34.0, (name, psnr)
        assert ssim >= tri_ssim + 0.02, (name, ssim, tri_ssim)


def test_4x_canonical_scratch_bundled_floor():
    """Gate over the from-scratch progressive-GAN two-pass pair (canonical
    runs 3+4, hinge + R1 + TTUR, no L1 warm start — the robustness result).
    Measured on the bundled frame: 35.92 dB / 0.9912."""
    psnr, ssim, tri, tri_ssim = _two_pass_4x("g1_scratch_4x",
                                             "g2_scratch_4x", "sim_1010c", 12)
    assert psnr >= tri + 5.0, (psnr, tri)
    assert psnr >= 34.0, psnr
    assert ssim >= tri_ssim + 0.02, (ssim, tri_ssim)


def test_4x_canonical_threepass_bundled_floor():
    """Gate over the L1 yz refiner (canonical run 5) stacked on the L1
    two-pass chain: pass 3 must not meaningfully hurt (eval-mean it's
    32.40 vs 32.42 two-pass; on this frame 36.04 vs 36.08)."""
    up, stages = 4, 2
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    g3 = G.make_pass3(32, 2, dtype=jnp.float32)
    p1 = _restore("g1_l1_4x", g1.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 16, 16, 4))))
    p2 = _restore("g2_l1_4x", g2.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 16, 16 * up, 4))))
    p3 = _restore("g3_l1p3_4x", g3.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 128, 128, 4))))
    d, lr, gt = _load_frame("sim_1010c", 12)
    out2 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    out3 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up,
                                              gen3=g3, params3=p3))
    psnr2, psnr3 = assemble.psnr_volume(out2, gt), assemble.psnr_volume(out3, gt)
    tri = assemble.psnr_volume(_trilinear(d, up), gt)
    assert psnr3 >= tri + 5.0, (psnr3, tri)
    assert psnr3 >= psnr2 - 0.2, (psnr3, psnr2)


def test_4x_gan_ema_demo_pair_psnr_floor():
    """Gate over the pair examples/demo.py mode=gan loads (the r2-era EMA
    fine-tuned G1 + L1 G2) — bundled since r2 but never gated until r5."""
    psnr, ssim, tri, tri_ssim = _two_pass_4x("g1_gan", "g2_l1",
                                             "sim_1010", 12)
    assert psnr >= tri + 4.0, (psnr, tri)
    assert psnr >= 34.0, psnr  # measured 36.6 dB at bundling time
    assert ssim >= tri_ssim + 0.02, (ssim, tri_ssim)


def _upscale_div(frames):
    """Two-pass 4x upscale of bundled sim_3020 frames with the diverse pair;
    returns (outs, gts, hr_velocities) as float32 numpy volumes."""
    up, stages = 4, 2
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    p1 = _restore("g1_div", g1.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 12, 12, 4))))
    p2 = _restore("g2_div", g2.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 12, 12 * up, 4))))
    outs, gts, vels = [], [], []
    for f in frames:
        d, lr, gt = _load_frame("sim_3020", f)
        out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr,
                                                 up_res=up))
        z, y, x, _ = d.shape
        v_hr = np.asarray(jax.image.resize(
            lr[..., 1:4], (z * up, y * up, x * up, 3), "linear")) * up
        outs.append(out.astype(np.float32))
        gts.append(np.asarray(gt, np.float32))
        vels.append(v_hr)
    return outs, gts, vels


def test_4x_diverse_model_temporal_coherence():
    """Temporal-coherence gate (VERDICT r3 weak #3 / next #5): tdiff =
    mean |d_t − A(d_{t−1}; v_t)| (tempoGAN T_diff, scripts/eval.py:87-98)
    over bundled consecutive frames 29→30→31 of the held-out 'moving' scene.
    Guards the failure mode the temporal discriminator exists to prevent:
    a regression that over-smooths motion (tdiff collapsing far below the
    ground-truth level) or destroys coherence (tdiff blowing up past GT)
    would pass the PSNR/SSIM gates but fail here."""
    from mpgan_tpu.ops.warp import advect_3d
    outs, gts, vels = _upscale_div([29, 30, 31])
    td, td_gt = [], []
    for i in (1, 2):
        warp_prev = np.asarray(advect_3d(jnp.asarray(outs[i - 1]),
                                         jnp.asarray(vels[i]), 1.0))
        td.append(float(np.abs(outs[i] - warp_prev).mean()))
        warp_gt = np.asarray(advect_3d(jnp.asarray(gts[i - 1]),
                                       jnp.asarray(vels[i]), 1.0))
        td_gt.append(float(np.abs(gts[i] - warp_gt).mean()))
    tdiff, tdiff_gt = np.mean(td), np.mean(td_gt)
    ratio = tdiff / tdiff_gt
    # dataset-wide measured ratio 0.74 (diverse_eval 40-frame mean
    # 0.00952/0.01293); per-frame values drift, hence the wide margins
    assert ratio >= 0.45, (tdiff, tdiff_gt)  # over-smooth: motion washed out
    assert ratio <= 1.35, (tdiff, tdiff_gt)  # incoherent: temporal noise


def test_4x_diverse_model_ood_generalization_floor():
    """Generalization gate (VERDICT r2 missing #4): the two-pass pair trained
    on the RANDOMIZED 'varied' scene family (scripts/diverse_recipe.sh) must
    beat trilinear on a bundled frame from the held-out 'moving' family —
    an orbiting obstacle, a scene kind training never produced."""
    up, stages = 4, 2
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    p1 = _restore("g1_div", g1.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 12, 12, 4))))
    p2 = _restore("g2_div", g2.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 12, 12 * up, 4))))
    d, lr, gt = _load_frame("sim_3020", 30)
    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    tri_vol = _trilinear(d, up)
    psnr = assemble.psnr_volume(out, gt)
    tri = assemble.psnr_volume(tri_vol, gt)
    assert psnr >= tri + 2.0, (psnr, tri)
    ssim = metrics.ssim_volume(out, gt)
    ssim_tri = metrics.ssim_volume(tri_vol, gt)
    assert ssim >= ssim_tri, (ssim, ssim_tri)


def test_8x_canonical_twopass_l1_bundled_floor():
    """Gate over the r5 canonical-rerun 8x L1 pair (canonical_recipe.sh 8x
    runs 0+1, eval row 8x_twopass_l1: 26.74 dB mean, trilinear 22.80) on the
    bundled regenerated-holdout frame (sim_2010c frame 24).
    Measured on this frame: 26.98 / 0.9564 vs trilinear 22.39 / 0.8183."""
    psnr, ssim, tri, tri_ssim = _two_pass_4x("g1_l1_8x", "g2_l1_8x",
                                             "sim_2010c", 24, up=8)
    assert psnr >= tri + 3.5, (psnr, tri)
    assert psnr >= 26.0, psnr
    assert ssim >= tri_ssim + 0.10, (ssim, tri_ssim)


def test_8x_canonical_ganft_bundled_floor():
    """Gate over the canonical 8x GAN fine-tune G1 and its EMA twin through
    the canonical L1 pass-2. Measured: raw 26.64 / 0.9533, EMA 26.93 /
    0.9560 (the EMA recovering most of the adversarial PSNR cost)."""
    for name in ("g1_ganft_8x", "g1_ganft_ema_8x"):
        psnr, ssim, tri, tri_ssim = _two_pass_4x(name, "g2_l1_8x",
                                                 "sim_2010c", 24, up=8)
        assert psnr >= tri + 3.0, (name, psnr, tri)
        assert psnr >= 25.5, (name, psnr)
        assert ssim >= tri_ssim + 0.10, (name, ssim, tri_ssim)


def test_8x_canonical_scratch_bundled_floor():
    """Gate over the 8x from-scratch progressive-GAN pair (canonical runs
    3+4). Weakest canonical config (eval mean 24.48 vs trilinear 22.80 —
    from-scratch trails the warm start by ~1.75 dB at 8x) but must still
    beat trilinear. Measured on the bundled frame: 24.84 / 0.9371 vs
    22.39 / 0.8183."""
    psnr, ssim, tri, tri_ssim = _two_pass_4x("g1_scratch_8x",
                                             "g2_scratch_8x", "sim_2010c",
                                             24, up=8)
    assert psnr >= tri + 1.8, (psnr, tri)
    assert psnr >= 24.0, psnr
    assert ssim >= tri_ssim + 0.08, (ssim, tri_ssim)


def test_8x_canonical_threepass_bundled_floor():
    """Gate over the 8x L1 yz refiner (canonical run 5) on the L1 chain —
    the BEST canonical 8x config (eval mean 27.35, +0.60 over two-pass).
    Measured on the bundled frame: 27.44 vs two-pass 26.98."""
    up, stages = 8, 3
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    g3 = G.make_pass3(32, 2, dtype=jnp.float32)
    p1 = _restore("g1_l1_8x", g1.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 16, 16, 4))))
    p2 = _restore("g2_l1_8x", g2.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 16, 16 * up, 4))))
    p3 = _restore("g3_l1p3_8x", g3.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 128, 128, 4))))
    d, lr, gt = _load_frame("sim_2010c", 24)
    out2 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    out3 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up,
                                              gen3=g3, params3=p3))
    psnr2, psnr3 = assemble.psnr_volume(out2, gt), assemble.psnr_volume(out3, gt)
    tri = assemble.psnr_volume(_trilinear(d, up), gt)
    assert psnr3 >= tri + 4.0, (psnr3, tri)
    assert psnr3 >= psnr2 - 0.1, (psnr3, psnr2)  # measured +0.47
    assert psnr3 >= 26.5, psnr3


def test_8x_progressive_bundled_psnr_floor():
    """From-scratch progressive-GAN pair at 8x, plus the L1 yz refiner
    (pass 3) which must not hurt two-pass quality."""
    up, stages = 8, 3
    g1 = G.make_pass1(stages, 32, 2, dtype=jnp.float32)
    g2 = G.make_pass2(stages, 32, 2, dtype=jnp.float32)
    p1 = _restore("g1_gan8", g1.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 16, 16, 4))))
    p2 = _restore("g2_gan8", g2.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 16, 16 * up, 4))))
    d, lr, gt = _load_frame("sim_2010", 24)
    out2 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up))
    tri_vol = _trilinear(d, up)
    psnr2 = assemble.psnr_volume(out2, gt)
    tri = assemble.psnr_volume(tri_vol, gt)
    assert psnr2 >= tri + 2.0, (psnr2, tri)
    assert psnr2 >= 27.5, psnr2  # measured 29.3 dB at round 2
    ssim2 = metrics.ssim_volume(out2, gt)
    ssim_tri = metrics.ssim_volume(tri_vol, gt)
    assert ssim2 >= ssim_tri + 0.05, (ssim2, ssim_tri)  # measured +0.091
    assert ssim2 >= 0.94, ssim2  # measured 0.958

    g3 = G.make_pass3(32, 2, dtype=jnp.float32)
    p3 = _restore("g3_l18", g3.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 4))))
    out3 = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up,
                                              gen3=g3, params3=p3))
    psnr3 = assemble.psnr_volume(out3, gt)
    assert psnr3 >= psnr2 - 0.1, (psnr3, psnr2)  # measured +0.43 dB
    ssim3 = metrics.ssim_volume(out3, gt)
    assert ssim3 >= ssim2 - 0.005, (ssim3, ssim2)  # measured +0.0076
