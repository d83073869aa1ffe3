"""The local oracle checker must be a FAITHFUL replica of the driver's
canonicalizer — two rounds in a row it was the blind spot (r1: silent
int/float coercion hid the HUGEINT mismatch; r2: `+ 0.0` normalization
hid the signed-zero covar mismatch, VERDICT r2 "What's wrong #1").
These pins make any re-softening of norm_cell an immediate test red.
No SparkSession needed — pure function tests.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from check_oracle import frame_hash, norm_cell  # noqa: E402

import pandas as pd  # noqa: E402


def test_negative_zero_is_preserved():
    # the driver's canonicalizer keeps IEEE -0.0; so must ours
    assert norm_cell(-0.0) == "-0.000000"
    assert norm_cell(0.0) == "0.000000"
    assert norm_cell(-0.0) != norm_cell(0.0)


def test_tiny_negative_rounds_to_negative_zero():
    # the exact r2 failure shape: covar_samp ~ -2.448e-07
    assert norm_cell(-2.448e-07) == "-0.000000"
    assert norm_cell(2.448e-07) == "0.000000"


def test_int_float_do_not_coerce():
    # the r1 failure shape: DuckDB HUGEINT->float 5.0 vs Spark bigint 5
    assert norm_cell(5) == "5"
    assert norm_cell(5.0) == "5.000000"
    assert norm_cell(5) != norm_cell(5.0)


def test_frame_hash_distinguishes_signed_zero():
    a = pd.DataFrame({"x": [0.0]})
    b = pd.DataFrame({"x": [-0.0]})
    assert frame_hash(a) != frame_hash(b)
