"""--py-files packaging (north-rule: run via spark-submit --py-files).

The full spark-submit smoke is exercised manually (tools/extract_submit.py
docstring); here we prove the zip artifact is importable as the ONLY
source of the package — what executors see — and runs the OCR kernel.
"""

import subprocess
import sys

from tools.build_pyfiles import build


def test_zip_is_self_contained(tmp_path):
    zip_path = build(str(tmp_path / "ppocr_spark.zip"))
    probe = r"""
import sys
zip_path = sys.argv[1]
# simulate the executor: the zip is the only way to reach the package
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)
import ppocr_spark.pipeline as pl
assert zip_path in pl.__file__, pl.__file__
from ppocr_spark.config import PPOCRConfig
from ppocr_spark.render import render_page
from ppocr_spark.png import encode_gray
img, _ = render_page(["alpha beta gamma"])
r = pl._ocr_one(encode_gray(img), PPOCRConfig())
assert r["code"] == 100 and r["text"], r
print("ZIP_OK", r["text"])
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, zip_path],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP_OK" in out.stdout


def test_zip_deterministic(tmp_path):
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
