"""Typed configuration + reference-compatible CLI mapping.

The reference drives everything through ~50-70 stringly-typed argv flags parsed
by ``paramhelpers.getParam`` (SURVEY.md §2.1/§2.2). We keep that CLI surface
(so reference command lines run verbatim) but immediately materialize it into
typed dataclasses that the rest of the framework consumes.

Flag names follow the upstream tempoGAN / Multi-pass-GAN conventions
(basePath, fromSim/toSim, upRes, tileSizeLow, useVelocities, trainingIters,
batchSize, lrgan, beta1, discRuns/genRuns, k/k2/kt/kf loss weights, out /
load_model_test / load_model_no, saveInterval/outputInterval, randSeed, ...).
Reference file:line citations are unavailable (mount empty at survey time).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from mpgan_tpu.utils import params as ph


@dataclass
class DataConfig:
    base_path: str = "data/"
    from_sim: int = 1000
    to_sim: int = 1000              # inclusive, like the reference
    frame_min: int = 0
    frame_max: int = 120            # exclusive
    data_dim: int = 3               # 2 or 3; reference supports both
    up_res: int = 4                 # total SR factor (2/4/8)
    tile_size_low: int = 16         # LR patch edge
    use_velocities: bool = True
    use_vorticities: bool = False
    data_fraction: float = 1.0      # fraction of frames loaded to host RAM
    mac_recenter: bool = False      # average staggered MAC velocity faces to
    # cell centers on load (io.uni.recenter_mac). Off by default: the
    # upstream tooling feeds MAC data as collocated (SURVEY.md §2.3), and
    # the in-repo solver already writes cell-centered values.
    density_threshold: float = 0.002  # near-empty tile rejection
    augment: bool = True
    rot_mode: int = 2               # 0 none, 1 90°-only, 2 continuous
    scale_min: float = 0.85
    scale_max: float = 1.15


@dataclass
class ModelConfig:
    n_base_filters: int = 32        # stem width of G
    n_res_blocks: int = 2           # residual blocks per growth stage
    disc_base_filters: int = 32
    gen_out_channels: int = 1       # density
    stages: int = 2                 # log2(up_res): 1→2x, 2→4x, 3→8x
    use_second_pass: bool = True
    dtype: str = "bfloat16"         # compute dtype on TPU
    param_dtype: str = "float32"
    remat: bool = False             # jax.checkpoint on G res-blocks (HBM saver)


@dataclass
class LossConfig:
    # tempoGAN-style lambdas (SURVEY.md §2.8); names mirror reference k-flags
    lambda_l1: float = 5.0          # k / kL1  — L1 content loss
    lambda_adv: float = 1.0         # adversarial (spatial)
    lambda_t: float = 1.0           # kt — temporal adversarial
    lambda_f: float = 1e-5          # kf — Ds feature-space loss
    gan_loss: str = "sce"           # sce | lsgan | hinge | wgan (ref default sce)
    label_smooth: float = 0.0       # one-sided D label smoothing (real→1−ε)
    r1_gamma: float = 0.0           # R1 penalty γ on D real-input grads (0=off)
    r1_interval: int = 1            # lazy R1: apply every k-th D step, γ
    # scaled ×k to keep the effective strength (StyleGAN2 lazy
    # regularization) — skips the extra D backward on the other k−1 steps
    gp_weight: float = 0.0          # WGAN-GP weight (0=off; pair with wgan)
    # temporal-warp backend: "auto" = Pallas kernel on TPU, XLA elsewhere
    warp_backend: str = "auto"      # auto | pallas | xla
    warp_max_disp: int = 8          # Pallas warp displacement clamp (HR px)


@dataclass
class TrainConfig:
    training_iters: int = 10000
    batch_size: int = 16
    learning_rate: float = 2e-4     # lrgan
    lr_disc: float = -1.0           # lrdisc — D learning rate (TTUR); -1 = lrgan
    beta1: float = 0.5
    adam_eps: float = 1e-8
    disc_runs: int = 1
    gen_runs: int = 1
    first_gen_run: bool = True      # train pass-1 (else pass-2)
    use_temporal_disc: bool = True
    save_interval: int = 1000
    output_interval: int = 100
    rand_seed: int = 42
    test_path: str = "test_out/"
    load_model_test: int = -1       # run dir index to restore from
    load_model_no: int = -1         # checkpoint number within that dir
    # progressive growing (SURVEY.md §2.9)
    use_growing: bool = False
    alpha_iters: int = 2000         # fade-in iterations per new stage
    stable_iters: int = 2000        # post-fade iterations per stage
    # generator weight EMA (ProGAN-family practice: evaluate/infer with an
    # exponential moving average of G; 0 = off, typical 0.999)
    ema_decay: float = 0.0
    # parallelism / dispatch
    data_axis: str = "data"
    steps_per_dispatch: int = 0   # lax.scan'd steps per device program call;
    # 0 = auto: measure the dispatch RPC latency at startup and pick the
    # smallest K (any integer, capped at 64) keeping dispatch overhead
    # <10% (loop.py pick_dispatch_k). In-process backends (CPU tests)
    # calibrate to K=1.
    # observability (SURVEY.md §5: tracing / failure detection)
    profile_dir: str = ""         # jax.profiler trace output dir ("" = off)
    debug_nans: bool = False      # jax debug_nans for fast failure detection


@dataclass
class InferConfig:
    output_only: bool = False       # 'out 1' in the reference CLI
    frame_min: int = 0
    frame_max: int = 120
    slice_chunk: int = 0            # slices per device step; 0 = one
    # unchunked batch (fastest; bounded by HBM — set a chunk for volumes
    # that do not fit, e.g. 128 at 512^3)
    write_uni: bool = True
    write_png: bool = False
    use_ema: bool = False           # load gen_ema_%04d instead of gen_%04d
    # pipeline-parallel frame streaming (SURVEY.md §2.14 PP row):
    # "" = off, "auto" = proportional chips-per-pass, "2,6" = explicit split
    pipeline_split: str = ""
    # idempotent sweeps (SURVEY.md §5 failure recovery): write into an
    # existing test_%04d run dir, skipping frames whose output exists
    # (-1 = allocate a fresh dir as usual)
    write_test: int = -1


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _log2i(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    if (1 << n) != x:
        raise ValueError(f"upRes must be a power of two, got {x}")
    return n


def from_cli(argv: list[str] | None = None) -> Config:
    """Parse a reference-style command line into a typed Config.

    Flag names match the reference CLI (SURVEY.md §2.1) so its documented
    invocations work unmodified, e.g.::

        train randSeed 42 out 0 trainingIters 10000 basePath ../data/ \
              fromSim 1000 toSim 1010 useVelocities 1 upRes 4 ...
    """
    if argv is not None:
        ph.setParams(argv)

    g = ph.get_typed
    data = DataConfig(
        base_path=g("basePath", DataConfig.base_path),
        from_sim=g("fromSim", DataConfig.from_sim),
        to_sim=g("toSim", DataConfig.to_sim),
        frame_min=g("frameMin", DataConfig.frame_min),
        frame_max=g("frameMax", DataConfig.frame_max),
        data_dim=g("dataDim", DataConfig.data_dim),
        up_res=g("upRes", DataConfig.up_res),
        tile_size_low=g("tileSizeLow", DataConfig.tile_size_low),
        use_velocities=bool(g("useVelocities", 1)),
        use_vorticities=bool(g("useVorticities", 0)),
        data_fraction=g("dataFraction", DataConfig.data_fraction),
        mac_recenter=bool(g("macRecenter", 0)),
        density_threshold=g("densityThreshold", DataConfig.density_threshold),
        augment=bool(g("augment", 1)),
        rot_mode=g("rot", DataConfig.rot_mode),
        scale_min=g("minScale", DataConfig.scale_min),
        scale_max=g("maxScale", DataConfig.scale_max),
    )
    model = ModelConfig(
        n_base_filters=g("genFilters", ModelConfig.n_base_filters),
        n_res_blocks=g("genBlocks", ModelConfig.n_res_blocks),
        disc_base_filters=g("discFilters", ModelConfig.disc_base_filters),
        stages=_log2i(data.up_res),
        use_second_pass=bool(g("secondPass", 1)),
        dtype=g("dtype", ModelConfig.dtype),
        remat=bool(g("remat", 0)),
    )
    loss = LossConfig(
        lambda_l1=g("k", LossConfig.lambda_l1),
        lambda_adv=g("kAdv", LossConfig.lambda_adv),
        lambda_t=g("kt", LossConfig.lambda_t),
        lambda_f=g("kf", LossConfig.lambda_f),
        gan_loss=g("ganLoss", LossConfig.gan_loss),
        label_smooth=g("labelSmooth", LossConfig.label_smooth),
        r1_gamma=g("r1Gamma", LossConfig.r1_gamma),
        r1_interval=g("r1Interval", LossConfig.r1_interval),
        gp_weight=g("gpWeight", LossConfig.gp_weight),
    )
    train = TrainConfig(
        # trainingEpochs / learningRate are the upstream-tempoGAN spellings
        # (SURVEY.md §2.1 "trainingIters/Epochs", "learningRate/lrgan")
        training_iters=g("trainingIters",
                         g("trainingEpochs", TrainConfig.training_iters)),
        batch_size=g("batchSize", TrainConfig.batch_size),
        learning_rate=g("lrgan", g("learningRate",
                                   TrainConfig.learning_rate)),
        lr_disc=g("lrdisc", TrainConfig.lr_disc),
        beta1=g("beta1", TrainConfig.beta1),
        adam_eps=g("adamEps", TrainConfig.adam_eps),
        disc_runs=g("discRuns", TrainConfig.disc_runs),
        gen_runs=g("genRuns", TrainConfig.gen_runs),
        first_gen_run=bool(g("firstNN", 1)),
        use_temporal_disc=bool(g("useTempoD", 1)),
        save_interval=g("saveInterval", TrainConfig.save_interval),
        output_interval=g("outputInterval", TrainConfig.output_interval),
        rand_seed=g("randSeed", TrainConfig.rand_seed),
        test_path=g("testPath", TrainConfig.test_path),
        load_model_test=g("load_model_test", TrainConfig.load_model_test),
        load_model_no=g("load_model_no", TrainConfig.load_model_no),
        use_growing=bool(g("useGrowing", 0)),
        alpha_iters=g("alphaIters", TrainConfig.alpha_iters),
        stable_iters=g("stableIters", TrainConfig.stable_iters),
        ema_decay=g("emaDecay", TrainConfig.ema_decay),
        steps_per_dispatch=g("stepsPerDispatch", TrainConfig.steps_per_dispatch),
        profile_dir=g("profileDir", TrainConfig.profile_dir),
        debug_nans=bool(g("debugNans", 0)),
    )
    infer = InferConfig(
        # outputOnly is the upstream-tempoGAN spelling of `out`
        output_only=bool(g("out", g("outputOnly", 0))),
        frame_min=g("outFrameMin", data.frame_min),
        frame_max=g("outFrameMax", data.frame_max),
        slice_chunk=g("sliceChunk", InferConfig.slice_chunk),
        write_uni=bool(g("writeUni", 1)),
        write_png=bool(g("writePng", 0)),
        use_ema=bool(g("useEma", 0)),
        pipeline_split=str(g("pipelineSplit", "")),
        write_test=g("writeTest", InferConfig.write_test),
    )
    ph.checkUnusedParams()
    return Config(data=data, model=model, loss=loss, train=train, infer=infer)
