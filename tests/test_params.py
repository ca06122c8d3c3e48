"""Tests for the reference-compatible param shim and typed config (SURVEY.md §2.1/§2.2)."""

import pytest

from mpgan_tpu import config as cfg
from mpgan_tpu.utils import params as ph

pytestmark = pytest.mark.quick


def test_getparam_returns_following_token_as_string():
    ph.setParams(["batchSize", "32", "basePath", "../data/"])
    assert ph.getParam("batchSize", 16) == "32"
    assert ph.getParam("basePath", "x") == "../data/"
    assert ph.getParam("missing", 7) == "7"
    ph.checkUnusedParams()  # all tokens were requested → no exit


def test_getparam_case_insensitive():
    ph.setParams(["BatchSize", "8"])
    assert ph.getParam("batchsize", 1) == "8"


def test_unused_param_aborts():
    ph.setParams(["batchSize", "32", "typoFlag", "1"])
    ph.getParam("batchSize", 16)
    with pytest.raises(SystemExit):
        ph.checkUnusedParams()


def test_from_cli_reference_style_invocation():
    c = cfg.from_cli(
        "randSeed 42 out 0 trainingIters 500 basePath ../data/ "
        "fromSim 1000 toSim 1010 useVelocities 1 upRes 4 batchSize 8 "
        "lrgan 0.0002 beta1 0.5 k 5.0 kt 1.0 kf 0.00001".split()
    )
    assert c.train.rand_seed == 42
    assert c.infer.output_only is False
    assert c.train.training_iters == 500
    assert c.data.base_path == "../data/"
    assert (c.data.from_sim, c.data.to_sim) == (1000, 1010)
    assert c.data.use_velocities is True
    assert c.data.up_res == 4 and c.model.stages == 2
    assert c.train.batch_size == 8
    assert c.loss.lambda_l1 == 5.0 and c.loss.lambda_t == 1.0


def test_from_cli_upstream_flag_aliases():
    """SURVEY.md §2.1: upstream tempoGAN spells these trainingEpochs /
    learningRate; the reference-repo spellings (trainingIters / lrgan) win
    when both are given."""
    c = cfg.from_cli("out 0 trainingEpochs 123 learningRate 0.0005".split())
    assert c.train.training_iters == 123
    assert abs(c.train.learning_rate - 5e-4) < 1e-12
    c = cfg.from_cli("out 0 trainingIters 7 trainingEpochs 9 "
                     "lrgan 0.001 learningRate 0.002".split())
    assert c.train.training_iters == 7
    assert abs(c.train.learning_rate - 1e-3) < 1e-12


def test_from_cli_defaults():
    c = cfg.from_cli([])
    assert c.data.up_res == 4
    assert c.model.stages == 2
    assert c.train.batch_size == 16


def test_bad_upres_raises():
    with pytest.raises(ValueError):
        cfg.from_cli(["upRes", "3"])
