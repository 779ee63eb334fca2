"""The --py-files artifact: deterministic, complete, importable from zip."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_submit_zip import build_zip  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_zip_is_deterministic_and_complete(tmp_path):
    z1 = tmp_path / "a.zip"
    z2 = tmp_path / "b.zip"
    m1 = build_zip(REPO, str(z1))
    m2 = build_zip(REPO, str(z2))
    assert m1 == m2
    assert z1.read_bytes() == z2.read_bytes(), "zip must be byte-stable"
    # every package module rides along
    assert "nem_mms_spark/cli.py" in m1
    assert "nem_mms_spark/jobs/encode.py" in m1
    assert "nem_mms_spark/codecs/fsst.py" in m1
    assert not any("__pycache__" in m for m in m1)


def test_kernels_import_from_zip_only(tmp_path):
    """Codec kernels must work with ONLY the zip on sys.path (the
    cluster-executor situation under spark-submit --py-files)."""
    z = tmp_path / "pkg.zip"
    build_zip(REPO, str(z))
    code = (
        "import numpy as np\n"
        "from nem_mms_spark.selector import ColumnContext, select_and_encode\n"
        "from nem_mms_spark.codecs import decode_block\n"
        "v = np.arange(1000, dtype=np.int64)\n"
        "codec, payload, params, _ = select_and_encode(v, '<i8', ColumnContext())\n"
        "out = decode_block(payload, params, 1000, '<i8', codec)\n"
        "assert (out == v).all(), (codec, out[:5])\n"
        "print('ok', codec)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = str(z)
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("ok")
