"""Smoke tests for the example programs' fast paths (the golden-system
examples run in seconds; the MPC/fleet demos are exercised by the
hardware drive in .claude/skills/verify/SKILL.md)."""

import os
import runpy
import sys

import pytest


def _run(name):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", f"{name}.py")
    argv = sys.argv
    sys.argv = [path]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = argv


def test_pcg_solve_example(capsys):
    _run("pcg_solve")
    out = capsys.readouterr().out
    assert "converged=True" in out
    assert "-303.7" in out  # golden lambda leading value


def test_pcg_solve_dp_example(capsys):
    _run("pcg_solve_dp")
    out = capsys.readouterr().out
    assert "converged=True" in out
    assert "e-1" in out or "e-0" in out  # max error line prints tiny number


def test_diff_solver_example(capsys):
    _run("diff_solver")
    out = capsys.readouterr().out
    assert "recovered gamma relative error" in out
    # one Newton step with an exact implicit gradient nails the target
    rel = float(out.strip().rsplit(" ", 1)[-1])
    assert rel < 1e-2


def test_sqp_quadrotor_example(capsys):
    _run("sqp_quadrotor")
    out = capsys.readouterr().out
    assert "converged=True" in out


def test_solver_modes_example(capsys):
    _run("solver_modes")
    out = capsys.readouterr().out
    assert out.count("converged=True") == 5
    # the compensated row reaches deep-tolerance accuracy even off-chip
    assert "compensated DF" in out
