#!/usr/bin/env python
"""Out-of-the-box demo: pretrained two-pass 4× SR on a bundled smoke frame.

    python examples/demo.py [gan]    # 'gan' uses the adversarially fine-tuned G1

Loads the committed checkpoints (24k-iter L1 + hinge/R1 GAN fine-tune on 10
solver sims; round 2),
super-resolves the bundled 32³ LR frame to 128³, reports PSNR vs the bundled
ground truth and vs trilinear upsampling, and writes mid-slice PNGs.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mpgan_tpu.io import uni
    from mpgan_tpu.infer import assemble
    from mpgan_tpu.models import generator as G

    use_gan = len(sys.argv) > 1 and sys.argv[1] == "gan"
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    g1 = G.make_pass1(2, 32, 2, dtype=dtype)
    g2 = G.make_pass2(2, 32, 2, dtype=dtype)
    t1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    t2 = g2.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 4)))
    ck = os.path.join(HERE, "checkpoints")
    name1 = "g1_gan" if use_gan else "g1_l1"
    p1 = _restore(ck, name1, t1)
    p2 = _restore(ck, "g2_l1", t2)

    d_dir = os.path.join(HERE, "data", "sim_1010")
    _, d = uni.readUni(os.path.join(d_dir, "density_low_0012.uni"))
    _, v = uni.readUni(os.path.join(d_dir, "velocity_low_0012.uni"))
    _, gt = uni.readUni(os.path.join(d_dir, "density_high_0012.uni"))
    lr = jnp.asarray(np.concatenate([d, v], axis=-1))

    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=4))
    z, y, x, _ = d.shape
    tri = np.asarray(jax.image.resize(jnp.asarray(d), (z*4, y*4, x*4, 1),
                                      "linear"))
    print(f"model ({name1} + g2_l1): PSNR {assemble.psnr_volume(out, gt):.2f} dB")
    print(f"trilinear baseline:      PSNR {assemble.psnr_volume(tri, gt):.2f} dB")

    try:
        from PIL import Image
        mid = x * 2
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
