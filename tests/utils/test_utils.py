"""Aux subsystem tests: timer, profiling scopes, CLI args, logging,
checkpoint."""

import numpy as np
import pytest

import elementalx as El
from elementalx import DistMatrix
from elementalx.utils import (
    Args,
    AUTO_PROFILE_REGION,
    BeginRegionProfile,
    EndRegionProfile,
    DisableProfiling,
    EnableProfiling,
    LoadMatrix,
    LogAppend,
    OpenLog,
    CloseLog,
    SaveMatrix,
    Timer,
)


def test_timer():
    import time

    t = Timer("x")
    with t:
        time.sleep(0.01)
    assert 0.005 < t.total < 1.0
    assert t.count == 1


def test_profile_regions(grid, rng):
    import jax

    a = rng.standard_normal((8, 8))
    A = DistMatrix.from_global(a, grid=grid)
    with AUTO_PROFILE_REGION("SUMMA.NNC"):
        out = El.Gemm(El.NORMAL, El.NORMAL, 1.0, A, A)
    assert np.isfinite(out.global_array()).all()
    BeginRegionProfile("region2")
    EndRegionProfile()
    DisableProfiling()
    with AUTO_PROFILE_REGION("disabled"):
        pass
    EnableProfiling()


def test_args_registry(capsys):
    args = Args(["--m", "100", "--unknown", "5"])
    assert args.input("--m", "height", 50) == 100
    assert args.input("--n", "width", 25) == 25
    args.process()
    args.print_report()
    out = capsys.readouterr()
    assert "unused argument --unknown" in out.err
    assert "--m: 100" in out.out


def test_logging(tmp_path):
    p = str(tmp_path / "log.txt")
    OpenLog(p)
    LogAppend("hello", 42)
    CloseLog()
    assert "hello 42" in open(p).read()


def test_checkpoint_roundtrip(grid, rng, tmp_path):
    a = rng.standard_normal((10, 6))
    A = DistMatrix.from_global(a, El.VC, El.STAR, grid=grid)
    path = str(tmp_path / "ckpt")
    SaveMatrix(A, path)
    B = LoadMatrix(path, grid=grid)
    assert B.dist == (El.VC, El.STAR)
    np.testing.assert_allclose(B.global_array(), a)
