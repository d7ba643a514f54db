"""WCNF + OPB kernel vs oracle cross-validation, incl. all format quirks."""

import hashlib

import numpy as np
import pytest

import oracle
from gbdc_spark.kernels import hashes, opb, wcnf
from gbdc_spark.sources import synth

IDS = list(range(80))


def _wcnf_text(fmt, top, weights, tokens):
    """Render the struct encoding to WCNF text for the text-based oracle."""
    clauses = hashes._split_weighted(np.asarray(tokens, dtype=np.int64))
    lines = []
    if fmt == "old":
        lines.append(f"p wcnf 99 {len(clauses)} {top}")
    for w, lits in zip(list(weights), clauses):
        body = " ".join(map(str, lits)) + " 0" if lits else "0"
        if w == hashes.HARD:
            lines.append(f"h {body}")
        else:
            lines.append(f"{w} {body}")
    return "\n".join(lines) + "\n"


def _doc(idx):
    row = synth.gen_wcnf_pdf(idx + 1, seed=3).iloc[idx]
    return row["fmt"], int(row["top"]), row["weights"], row["tokens"]


@pytest.mark.parametrize("idx", IDS)
def test_wcnf_features_match_oracle(idx):
    fmt, top, weights, tokens = _doc(idx)
    got = wcnf.wcnf_base_features(weights, top, tokens)
    want = oracle.wcnf_base_features(_wcnf_text(fmt, top, weights, tokens))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)


def test_wcnf_names_shape():
    assert len(wcnf.WCNF_BASE_FEATURES_NAMES) == 73
    fmt, top, weights, tokens = _doc(0)
    assert wcnf.wcnf_base_features(weights, top, tokens).shape == (73,)


@pytest.mark.parametrize("idx", IDS)
def test_wcnf_gbdhash_matches_oracle(idx):
    fmt, top, weights, tokens = _doc(idx)
    text = _wcnf_text(fmt, top, weights, tokens)
    assert hashes.gbdhash_wcnf(weights, top, tokens) == oracle.wcnf_gbdhash(text)
    assert hashes.gbdhash_wcnf_text(text) == oracle.wcnf_gbdhash(text)


@pytest.mark.parametrize("idx", IDS)
def test_wcnf_isohash_matches_oracle(idx):
    fmt, top, weights, tokens = _doc(idx)
    assert hashes.isohash_wcnf(weights, top, tokens) == oracle.wcnf_isohash(
        _wcnf_text(fmt, top, weights, tokens)
    )


def test_wcnf_hash_notfirst_quirk():
    # consecutive new-format 'h' clauses are NOT space-separated
    weights = [hashes.HARD, hashes.HARD, 5]
    tokens = [1, 2, 0, 3, 0, -1, 0]
    # ... and the first numeric-weight clause after them gets no
    # separator either, because notfirst is still false at that point
    want = hashlib.md5(b"h 1 2 0h 3 05 -1 0").hexdigest()
    assert hashes.gbdhash_wcnf(weights, 0, tokens) == want


def test_wcnf_old_to_new_conversion():
    # old format: weight >= top -> "h"; below top keeps numeric weight
    weights = [10, 3]
    tokens = [1, 2, 0, -2, 0]
    want = hashlib.md5(b"h 1 2 0 3 -2 0").hexdigest()
    assert hashes.gbdhash_wcnf(weights, 10, tokens) == want


def test_wcnf_isohash_weight_plus_one_quirk():
    # single soft clause (w=5) with lit 1: soft degree = w+1 = 6
    got = hashes.isohash_wcnf([5], 0, [1, 0])
    want = hashlib.md5(b"softs 0 6 ").hexdigest()
    assert got == want


def test_wcnf_base1_weight_zero_is_hard_quirk():
    # new-format weight-0 clause counts as HARD in Base1 (h_clauses=1)
    feats = dict(zip(wcnf.WCNF_BASE_FEATURES_NAMES,
                     wcnf.wcnf_base_features([0], 0, [1, 2, 0])))
    assert feats["h_clauses"] == 1
    assert feats["s_clauses"] == 0
    # ... but isohash treats it as soft (weight+1 = 1 per occurrence)
    assert hashes.isohash_wcnf([0], 0, [1, 0]) == hashlib.md5(b"softs 0 1 ").hexdigest()


def test_wcnf_new_format_vdegree_counts_soft():
    # Base2 pass-1 precedence quirk: new format counts soft clauses too
    feats = dict(zip(wcnf.WCNF_BASE_FEATURES_NAMES,
                     wcnf.wcnf_base_features([hashes.HARD, 7], 0, [1, 0, 1, 0])))
    # vdegree[1] = 2 (hard + soft), so max = 2
    assert feats["h_vcg_vdegree_max"] == 2
    # pass 2: only the 'h' clause contributes cg_degree = vdegree[1] = 2
    assert feats["h_cg_degree_max"] == 2
    assert feats["h_cg_degree_min"] == 2


# ------------------------------------------------------------------- OPB
def test_opb_names_shape():
    assert len(opb.OPB_BASE_FEATURES_NAMES) == 17
    assert opb.opb_base_features("").shape == (17,)


def _opb(payload):
    return dict(zip(opb.OPB_BASE_FEATURES_NAMES, opb.opb_base_features(payload)))


def test_opb_classification():
    f = _opb(
        "* comment\n"
        "min: 2 x1 -3 x2;\n"
        "1 x1 1 x2 1 x3 >= 1;\n"      # clause
        "2 x1 2 x2 >= 3;\n"            # assignment (max-minc=2 < 3 < max=4) & card
        "1 x1 1 x2 = 5;\n"             # unsat (max=2 < 5)
        "3 x1 -3 x2 >= -3;\n"          # tautology (min=-3 >= -3) & card_ge
        "2 x1 5 x2 >= 3;\n"            # general pb_ge
    )
    assert f["constraints"] == 5
    assert f["clauses"] == 1
    assert f["assignments"] == 1
    assert f["trivially_unsat"] == 1.0
    assert f["cards_ge"] >= 1
    assert f["pbs_ge"] >= 1
    assert f["obj_terms"] == 2
    assert f["obj_max_val"] == 2.0
    assert f["obj_min_val"] == -3.0


def test_opb_first_objective_wins():
    f = _opb("min: 1 x1;\nmin: 9 x2;\n1 x1 >= 1;\n")
    assert f["obj_terms"] == 1
    assert f["obj_max_val"] == 1.0


def test_opb_maxvar_plus_one_quirk():
    # variables = max(var_index + 1)  (OPBBaseFeatures.h:52)
    f = _opb("1 x7 >= 1;\n")
    assert f["variables"] == 8


def test_opb_negated_literals():
    f = _opb("2 ~x1 3 x2 >= 2;\n")
    assert f["constraints"] == 1
    assert f["variables"] == 3


def test_opb_card_truncation_quirk():
    # coefficients 2.x all truncate to 2 -> still cardinality
    # (can't write fractional coeffs in int OPB, but kernel must truncate)
    import numpy as np
    from gbdc_spark.kernels.opb import _TermSum, _analyse
    from gbdc_spark.kernels.scan import Scanner

    ts = _TermSum(Scanner("2 x1 2 x2 >= 1;"))
    a = _analyse(ts, "GE", 1.0)
    assert a["card"]


@pytest.mark.parametrize("idx", IDS)
def test_opb_random_runs(idx):
    payload = synth.gen_opb_payload(5, idx)
    feats = opb.opb_base_features(payload)
    assert feats.shape == (17,)
    assert np.isfinite(feats).all()


def test_opb_hash():
    text = "* c\nmin: 2 x1 -3 x2;\n1 x1 1 ~x2 >= 1;\n"
    want = hashlib.md5(b"min: 2 x1 -3 x2;1 x1 1 ~x2 >= 1;").hexdigest()
    assert hashes.gbdhash_opb_text(text) == want
