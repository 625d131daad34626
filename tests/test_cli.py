"""CLI driver tests (`python -m krylov_tpu`).

The reference's driver layer was external and never committed (gitignored
``*.sh`` + ``condition.json`` — reference: v1/threads/.gitignore:1-7); here
it is a tested part of the package.
"""

import json

import numpy as np
import pytest
import scipy.sparse as sp

from krylov_tpu import checkpoint
from krylov_tpu.cli import main


def test_solve_fixture_roundtrip(tmp_path):
    out = tmp_path / "x.npz"
    rc = main([
        "solve", "--fixture", "laplace2d", "--n", "16",
        "--method", "cg", "--tol", "1e-8", "--dtype", "float64",
        "--out", str(out), "--quiet",
    ])
    assert rc == 0
    x, info = checkpoint.load(str(out))
    assert info["meta"]["converged"]
    from krylov_tpu.sparse.fixtures import laplace2d

    A = laplace2d(16, dtype=np.float64)
    b = np.ones(A.shape[0])
    res = np.linalg.norm(b - np.asarray(A.matvec(x))) / np.linalg.norm(b)
    assert res < 1e-7


def test_solve_condition_json(tmp_path):
    # scipy .npz matrix + condition.json, flags overriding config
    A = sp.diags(
        [-1.0, 2.0, -1.0], [-1, 0, 1], shape=(128, 128)
    ).tocsr()
    mat = tmp_path / "A.npz"
    sp.save_npz(str(mat), A)
    cond = tmp_path / "condition.json"
    cond.write_text(json.dumps({
        "matrix": str(mat),
        "method": "mrr",
        "tol": 1e-6,
        "dtype": "float64",
        "b": "ones",
    }))
    out = tmp_path / "sol.npz"
    rc = main([
        "solve", "--config", str(cond), "--method", "kskipmrr", "--k", "2",
        "--out", str(out), "--quiet",
    ])
    assert rc == 0
    x, info = checkpoint.load(str(out))
    assert info["meta"]["method"] == "kskipmrr"
    assert np.linalg.norm(A @ x - np.ones(128)) / np.sqrt(128) < 1e-5


def test_solve_precond_and_refine():
    rc = main([
        "solve", "--fixture", "poisson1d", "--n", "64",
        "--method", "pcg", "--precond", "jacobi", "--dtype", "float64",
        "--tol", "1e-8", "--quiet",
    ])
    assert rc == 0


def test_solve_mesh():
    rc = main([
        "solve", "--fixture", "laplace2d", "--n", "16", "--mesh",
        "--dtype", "float64", "--tol", "1e-8", "--quiet",
    ])
    assert rc == 0


def test_nonconverged_exit_code():
    rc = main([
        "solve", "--fixture", "laplace2d", "--n", "32",
        "--tol", "1e-12", "--maxiter", "3", "--dtype", "float64", "--quiet",
    ])
    assert rc == 1


def test_info_reports_container(capsys, tmp_path):
    rc = main(["info", "--fixture", "laplace2d", "--n", "16"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["container"] == "StencilMatrix"
    assert rep["shape"] == [256, 256]
    assert rep["stencil_points"] == 5

    A = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(64, 64)).tocsr()
    mat = tmp_path / "A.npz"
    sp.save_npz(str(mat), A)
    rc = main(["info", "--matrix", str(mat)])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert rep["container"] == "DiaMatrix"
    assert rep["bandwidth"] == 1


def test_bad_inputs():
    with pytest.raises(SystemExit):
        main(["solve", "--fixture", "nope"])
    assert main(["solve", "--quiet"]) == 2  # no matrix source
    with pytest.raises(ValueError):
        main(["solve", "--matrix", "A.xyz", "--quiet"])
