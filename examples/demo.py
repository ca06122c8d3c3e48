#!/usr/bin/env python
"""Out-of-the-box demo: pretrained two-pass SR on bundled smoke frames.

    python examples/demo.py          # 4x: L1 pair, 32^3 -> 128^3
    python examples/demo.py gan      # 4x with the adversarially fine-tuned G1
    python examples/demo.py 8x       # 8x: from-scratch progressive GAN pair,
                                     #     16^3 -> 128^3
    python examples/demo.py 8x3      # 8x + the L1-trained yz refiner
                                     #     (third pass, +0.7 dB)

Loads the committed checkpoints (round 2: 24k-iter L1 at 4x; the `gan`
G1 is the EMA generator of a hinge + lazy-R1 fine-tune, emaDecay 0.999;
from-scratch hinge/R1 progressive GAN at 8x; 10 solver sims each),
super-resolves the bundled LR frame, reports PSNR vs the bundled ground
truth and vs trilinear upsampling, and writes mid-slice PNGs.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import numpy as np

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()  # JAX_PLATFORMS must win over sitecustomize's pin
setup_compilation_cache()  # repeat demo runs skip the cold compile


def main():
    import jax
    import jax.numpy as jnp
    from mpgan_tpu.io import uni
    from mpgan_tpu.infer import assemble
    from mpgan_tpu.models import generator as G

    mode = sys.argv[1] if len(sys.argv) > 1 else "l1"
    if mode not in ("l1", "gan", "8x", "8x3"):
        sys.exit(f"unknown mode {mode!r}; usage: demo.py [l1|gan|8x|8x3]")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ck = os.path.join(HERE, "checkpoints")

    if mode in ("8x", "8x3"):
        # 8x3 = three passes: + the L1-trained yz refiner (BASELINE row 5b)
        up, stages = 8, 3
        name1, name2 = "g1_gan8", "g2_gan8"
        d_dir = os.path.join(HERE, "data", "sim_2010")
        frame = 24
    else:
        up, stages = 4, 2
        name1 = "g1_gan" if mode == "gan" else "g1_l1"
        name2 = "g2_l1"
        d_dir = os.path.join(HERE, "data", "sim_1010")
        frame = 12

    g1 = G.make_pass1(stages, 32, 2, dtype=dtype)
    g2 = G.make_pass2(stages, 32, 2, dtype=dtype)
    t1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    t2 = g2.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16 * up, 4)))
    p1 = _restore(ck, name1, t1)
    p2 = _restore(ck, name2, t2)
    g3 = p3 = None
    if mode == "8x3":
        g3 = G.make_pass3(32, 2, dtype=dtype)
        t3 = g3.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)))
        p3 = _restore(ck, "g3_l18", t3)
        name2 = name2 + " + g3_l18"

    _, d = uni.readUni(os.path.join(d_dir, f"density_low_{frame:04d}.uni"))
    _, v = uni.readUni(os.path.join(d_dir, f"velocity_low_{frame:04d}.uni"))
    _, gt = uni.readUni(os.path.join(d_dir, f"density_high_{frame:04d}.uni"))
    lr = jnp.asarray(np.concatenate([d, v], axis=-1))

    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=up,
                                             gen3=g3, params3=p3))
    z, y, x, _ = d.shape
    tri = np.asarray(jax.image.resize(jnp.asarray(d), (z*up, y*up, x*up, 1),
                                      "linear"))
    from mpgan_tpu.utils.metrics import ssim_volume
    print(f"model ({name1} + {name2}): PSNR {assemble.psnr_volume(out, gt):.2f} dB"
          f"  SSIM {ssim_volume(out, gt):.4f}")
    print(f"trilinear baseline:      PSNR {assemble.psnr_volume(tri, gt):.2f} dB"
          f"  SSIM {ssim_volume(tri, gt):.4f}")

    try:
        from PIL import Image
        mid = x * up // 2  # HR mid-slice index (x*2 was only mid for up=4)
        def sl(a):
            return np.clip(a[:, :, mid, 0][::-1] * 255 / max(gt.max(), 1e-6),
                           0, 255).astype(np.uint8)
        strip = np.concatenate([sl(tri), sl(out), sl(gt)], axis=1)
        Image.fromarray(strip).save(os.path.join(HERE, "demo_out.png"))
        print("wrote examples/demo_out.png  [trilinear | model | ground truth]")
    except ImportError:
        pass


def _restore(ck_dir, name, template):
    import jax
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ck_dir, name))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, abstract)


if __name__ == "__main__":
    main()
