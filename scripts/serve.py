#!/usr/bin/env python
"""Inference serving daemon: load checkpoints once, answer volume requests.

    python scripts/serve.py basePath data/ upRes 4 tileSizeLow 16 \
        useVelocities 1 load_model_test 0 load_model_no 9 \
        load_model_test2 1 load_model_no2 9 testPath runs/ \
        sock /tmp/mpgan.sock warmShape 64,64,64

Model flags are identical to ``multipass_gan.py out 1`` (SURVEY.md §2.1
flag surface); serving-specific flags:

    sock       Unix-socket path to listen on (default <testPath>/mpgan.sock)
    warmShape  "z,y,x" LR shape to pre-compile before accepting requests
               ("" = compile lazily on the first request of each shape)

Clients: ``mpgan_tpu.serve.Client(sock).upscale(lr_volume)``; wire protocol
documented in mpgan_tpu/serve.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpgan_tpu.utils.platform import honor_jax_platforms_env, setup_compilation_cache

honor_jax_platforms_env()  # JAX_PLATFORMS must win over sitecustomize's pin

from mpgan_tpu.utils import params as ph


def main(argv=None):
    if argv is not None:
        ph.setParams(argv)
    cc = ph.getParam("compileCache", "")
    setup_compilation_cache(cc if cc else None)
    sock_path = ph.getParam("sock", "")
    warm_shape = ph.getParam("warmShape", "")
    load_test2 = int(ph.getParam("load_model_test2", -1))
    load_no2 = int(ph.getParam("load_model_no2", -1))
    load_test3 = int(ph.getParam("load_model_test3", -1))
    load_no3 = int(ph.getParam("load_model_no3", -1))

    from mpgan_tpu import config as cfgmod
    cfg = cfgmod.from_cli(None)

    import jax
    from mpgan_tpu.infer.load import load_pass_chain, make_default_upscaler
    from mpgan_tpu.serve import InferenceServer

    chain = load_pass_chain(cfg, load_test2, load_no2, load_test3, load_no3)
    gen2, gen3 = chain[2], chain[4]
    upscale = make_default_upscaler(cfg, chain)

    if not sock_path:
        os.makedirs(cfg.train.test_path, exist_ok=True)
        sock_path = os.path.join(cfg.train.test_path, "mpgan.sock")
    # must match the pass-1 stem: vorticity-trained models take 7 channels
    c_in = 1
    if cfg.data.use_velocities:
        c_in += 3
        if cfg.data.use_vorticities:
            c_in += 3
    server = InferenceServer(upscale, sock_path, expect_channels=c_in)
    if warm_shape:
        z, y, x = (int(v) for v in warm_shape.split(","))
        print(f"warming {z}x{y}x{x}x{c_in} ...", flush=True)
        server.warm((z, y, x, c_in))
    passes = 1 + (gen2 is not None) + (gen3 is not None)
    print(f"serving {passes}-pass {cfg.data.up_res}x SR on {sock_path} "
          f"({jax.default_backend()}, {len(jax.devices())} device(s))",
          flush=True)
    server.serve_forever()
    print("server shut down")


if __name__ == "__main__":
    main()
