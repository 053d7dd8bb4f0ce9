"""DoReMi-style domain reweighting (operators/doremi.py): the
Group-DRO semantics on a planted corpus -- a domain whose text a
domain-fit model explains far better than the generic reference model
(= headroom) must be upweighted; a domain indistinguishable from the
corpus average must not."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.doremi import (
    doremi_domain_log_weights,
    doremi_select,
)


@pytest.fixture(scope="module")
def planted(spark):
    # "jargon": every doc repeats its own rare technical vocabulary --
    # the whole-corpus reference model is very surprised, the
    # domain-fit model is not (large positive excess). "common": docs
    # drawn from one shared small vocabulary that dominates the corpus
    # -- reference and domain models nearly coincide (excess ~ 0).
    rows = []
    common_words = "the data table row value scan query join plan cost"
    for i in range(40):
        rows.append((i, "common", common_words))
    for i in range(40, 60):
        rows.append(
            (i, "jargon",
             f"flux{i % 5} qubit{i % 5} anneal{i % 5} "
             f"flux{i % 5} qubit{i % 5} anneal{i % 5}")
        )
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_headroom_domain_upweighted(planted):
    w = {
        r.domain: r
        for r in doremi_domain_log_weights(planted).collect()
    }
    assert set(w) == {"common", "jargon"}
    assert w["jargon"].log_weight_micronats > w["common"].log_weight_micronats
    assert w["jargon"].excess_micronats > w["common"].excess_micronats
    # per-token headroom: the jargon domain's gap between reference
    # and domain-fit model dwarfs the common domain's (the common
    # domain's excess is small-but-positive -- its own model always
    # fits at least as well as the jargon-diluted reference)
    per_tok_common = (
        w["common"].excess_micronats / w["common"].n_tokens
    )
    per_tok_jargon = (
        w["jargon"].excess_micronats / w["jargon"].n_tokens
    )
    assert per_tok_jargon > 4 * max(per_tok_common, 1)


@pytest.mark.full
def test_selection_tilts_toward_headroom(planted):
    sel = doremi_select(planted, 30).collect()
    assert len(sel) == 30
    n_jargon = sum(1 for r in sel if r.source == "jargon")
    # jargon is 1/3 of the corpus but softmax-upweighted: it must be
    # overrepresented relative to its population share
    assert n_jargon > 10
    # deterministic: same call, same selection
    again = doremi_select(planted, 30).collect()
    assert sorted(r.doc_id for r in sel) == sorted(
        r.doc_id for r in again
    )


@pytest.mark.full
def test_eta_scales_log_weights(planted):
    base = {
        r.domain: r.log_weight_micronats
        for r in doremi_domain_log_weights(
            planted, eta_num=1, eta_den=4
        ).collect()
    }
    hot = {
        r.domain: r.log_weight_micronats
        for r in doremi_domain_log_weights(
            planted, eta_num=1, eta_den=1
        ).collect()
    }
    # 4x learning rate ~ 4x the log-weight: 4*floor(x/4) differs from
    # floor(x) by < 4 per round, so the bound is 4 * n_rounds
    for d in base:
        assert abs(hot[d] - 4 * base[d]) < 16


@pytest.mark.full
def test_rounds_partition_tokens(planted):
    w4 = {
        r.domain: r.n_tokens
        for r in doremi_domain_log_weights(planted, n_rounds=4).collect()
    }
    w1 = {
        r.domain: r.n_tokens
        for r in doremi_domain_log_weights(planted, n_rounds=1).collect()
    }
    # every token lands in exactly one round regardless of n_rounds
    assert w4 == w1
