"""Backend exactness validation on the CPU test mesh.

bench.py runs the same checks on the real TPU chip; here they gate the
virtual-device backend every test run.
"""

from minnow_tpu.ops import validate


def test_backend_is_bit_exact():
    report = validate.validate_backend()
    assert report["exact"]
    assert report["backend"] == "cpu"


def test_pallas_encode_validation_interpret():
    validate.validate_pallas_encode(interpret=True)


def test_pallas_group_validation_interpret():
    validate.validate_pallas_group(interpret=True)
