"""Property-based tests (hypothesis) over the pure-Python operator cores.

No Spark session needed — these pin invariants of the functions that run
inside the UDFs, where a crash would kill an executor task at scale.
"""

from __future__ import annotations

import string

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extraction_svc_spark.functions import htmltext
from entity_extraction_svc_spark.operators.chunker import chunk_doc
from entity_extraction_svc_spark.operators.ner import (
    decode_bio,
    tokenize_with_offsets,
)
from entity_extraction_svc_spark.sources.kb import normalize_label

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_preprocess_html_total(s):
    """The extraction chain never raises and never emits raw whitespace runs."""
    out = htmltext.preprocess_html(f"<html><body><p>{s}</p></body></html>")
    assert "  " not in out
    assert "\n" not in out and "\t" not in out
    if out:
        assert out[-1] in ".,?!" or not out.strip()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_preprocess_html_arbitrary_bytes(b):
    """Arbitrary (possibly invalid-utf8) payload bytes never crash the UDF."""
    htmltext.preprocess_html(b)


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_chunk_doc_reassembles(s):
    """Chunks cover the sanitized doc: every sentence offset indexes into its
    chunk text, and chunk lengths are bounded."""
    for chunk_text, sents, offs in chunk_doc(s):
        assert len(sents) == len(offs)
        if chunk_text == "а":
            # C4 empty-doc placeholder: the reference emits chunk "а" while
            # the sentence list carries the raw doc (ner_chunker.py:166-170)
            continue
        for sent, (a, b) in zip(sents, offs):
            assert 0 <= a <= b <= len(chunk_text) + 2
            # the chunk text is .strip().strip(",")-ed AFTER sentence offsets
            # are computed (reference ner_chunker.py:160, byte-identical
            # sanitize at :181-195), so offsets sit up to head-strip chars
            # right of the true position when a sanitized piece begins with
            # whitespace (e.g. a NEL -> space substitution at piece start;
            # hypothesis found '\x85\x1b\n0!').  Downstream re-alignment
            # (N7, linker.py:864) absorbs exactly this shift in production.
            want = sent.strip().strip(",").strip()
            cands = [
                chunk_text[max(0, a - sh):max(0, b - sh)]
                .strip().strip(",").strip()
                for sh in (0, 1, 2)
            ]
            assert want in cands, (chunk_text, sent, a, b)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenize_offsets_are_exact(s):
    tokens, offsets = tokenize_with_offsets(s)
    assert len(tokens) == len(offsets)
    for tok, (a, b) in zip(tokens, offsets):
        assert s[a:b] == tok


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["Alpha", "beta", "Gamma,", "42", ",", "x"]),
                max_size=12))
def test_decode_bio_invariants(tokens):
    """Decoded mentions are lowercase, len>2, offsets ordered and in range."""
    text = " ".join(tokens)
    toks, offs = tokenize_with_offsets(text)
    tags = ["B-PER" if i % 3 == 0 else ("I-PER" if i % 3 == 1 else "O")
            for i in range(len(toks))]
    probas = [0.9] * len(toks)
    for substr, start, end, proba, tag in decode_bio(toks, tags, probas, offs):
        assert substr == substr.lower() and len(substr) > 2
        assert 0 <= start < end <= len(text)
        assert 0.0 <= proba <= 1.0
        assert tag == "PER"


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_normalize_label_idempotent(s):
    once = normalize_label(s)
    assert normalize_label(once) == once
    assert "  " not in once
    assert not set(once) & set(".,&-'/:")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.printable, max_size=200))
def test_decoded_substr_matches_pipeline_decode(surface):
    """The fixture generator's independent mini-decoder agrees with the real
    decode pipeline on arbitrary printable surfaces (the oracle-vs-engine
    agreement that makes golden substr values trustworthy)."""
    from entity_extraction_svc_spark.fixtures import _decoded_substr

    toks, offs = tokenize_with_offsets(surface.lower())
    if not toks:
        return
    tags = ["B-MISC"] + ["I-MISC"] * (len(toks) - 1)
    decoded = decode_bio(toks, tags, [0.9] * len(toks), offs)
    expected = _decoded_substr(surface)
    if decoded:
        # pipeline applies extra filters (stopwords, len>2, printable); when
        # it emits, the surface form must match the template-side decoder
        assert decoded[0][0] == expected


# ---------------------------------------------------------------------------
# round-2 seam properties
# ---------------------------------------------------------------------------

proba_matrix = st.lists(
    st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=5, max_size=5),
    min_size=1, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(proba_matrix, st.booleans())
def test_tags_from_probas_matches_loop_oracle(rows, short):
    """The vectorized N4 decode == the literal per-token reference rule on
    arbitrary probability rows (including ties and all-zero rows)."""
    import numpy as np

    from entity_extraction_svc_spark.operators.tagger import (
        SHORT_TEXT_THRES,
        THRES_PROBA,
        build_tags_init,
        tags_from_probas,
    )

    tags_init = build_tags_init(["LOC", "PER"])
    thres = SHORT_TEXT_THRES if short else THRES_PROBA
    got_tags, got_probas = tags_from_probas(
        np.array(rows), tags_init, short_text=short
    )
    exp_tags, exp_probas = [], []
    for p in rows:
        k = max(range(len(p)), key=lambda i: (p[i], -i))
        if p[0] < thres:
            k = max(range(1, len(p)), key=lambda i: (p[i], -i))
        exp_tags.append(tags_init[k])
        exp_probas.append(p[k])
    assert got_tags == exp_tags
    assert got_probas == pytest.approx(exp_probas)


span_labels = st.sampled_from(["O", "B-ENT", "I-ENT", "B-MISC", "I-MISC"])


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1, 10).flatmap(
        lambda n: st.tuples(
            st.just(["tok%d" % i for i in range(n)]),
            st.lists(
                st.lists(st.floats(0, 1, allow_nan=False), min_size=3, max_size=3),
                min_size=n, max_size=n,
            ),
            st.lists(span_labels, min_size=n, max_size=n),
        )
    ),
    st.floats(0.1, 0.95),
)
def test_merge_markups_invariants(tokens_types_spans, misc_thres):
    """Structural invariants of the MergeMarkups port on arbitrary inputs:
    y has one label per token; every emitted entity's positions are a
    contiguous in-range run; tags/probas/positions/entities stay aligned;
    raising the MISC threshold never ADDS a MISC-span entity."""
    from entity_extraction_svc_spark.operators.tagger import merge_markups_text

    tokens, y_types, y_spans = tokens_types_spans
    fine = ["PER", "LOC", "ORG"]
    out = merge_markups_text(tokens, y_types, y_spans, fine,
                             misc_thres=misc_thres, stopwords=set())
    assert len(out["y"]) == len(tokens)
    assert len(out["entities"]) == len(out["positions"]) \
        == len(out["tags"]) == len(out["probas"])
    for ent, pos in zip(out["entities"], out["positions"]):
        assert pos == list(range(pos[0], pos[-1] + 1))
        assert 0 <= pos[0] and pos[-1] < len(tokens)
        assert ent == " ".join(tokens[pos[0] : pos[-1] + 1])
    # monotonicity in the MISC gate
    stricter = merge_markups_text(tokens, y_types, y_spans, fine,
                                  misc_thres=min(misc_thres + 0.3, 1.0),
                                  stopwords=set())
    misc_spans = {i for i, s in enumerate(y_spans) if "MISC" in s}
    got_misc = [p for p in out["positions"] if p[0] in misc_spans]
    got_misc_strict = [p for p in stricter["positions"] if p[0] in misc_spans]
    assert len(got_misc_strict) <= len(got_misc)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-64, 64).map(lambda i: i / 64),
                min_size=8, max_size=8))
def test_rp_signature_python_matches_definition(vec):
    """Driver-side query signature == the documented sign-of-dot rule.

    Components are exact dyadic rationals so serial and SIMD summation
    agree bit-for-bit — the property pins the bit-packing logic, not float
    associativity (a sign(0)-boundary denormal can legitimately flip under
    reordering; index build and probe both use the same numpy matmul, so
    they stay mutually consistent either way)."""
    from entity_extraction_svc_spark.operators.annindex import (
        _planes,
        rp_sig_of,
    )

    planes = _planes(8, 8)
    sig = rp_sig_of(vec, planes)
    expected = 0
    for j in range(8):
        dot = sum(planes[j][d] * vec[d] for d in range(8))
        if dot > 0:
            expected |= 1 << j
    assert sig == expected


# ---------------------------------------------------------------------------
# round-3 operators: pure-python twins of the UDF/SQL cores
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                max_size=40))
def test_pagerank_reference_mass_conserved(edges):
    """The driver-side reference recurrence (the semantics the Spark op and
    the unrolled SQL both implement) conserves rank mass on ANY directed
    graph — dangling redistribution is what makes this hold."""
    from tests.test_pagerank import _pr_reference

    if not edges:
        return
    r = _pr_reference(edges, iterations=8)
    assert abs(sum(r.values()) - 1.0) < 1e-4
    assert all(v > 0 for v in r.values())


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_pii_redaction_idempotent(s):
    """redact(redact(x)) == redact(x): placeholders never re-match any
    pattern (a second pass over exported data must be a no-op)."""
    import re

    from entity_extraction_svc_spark.operators.privacy import PII_PATTERNS

    def redact(text):
        for _, pat, placeholder in PII_PATTERNS:
            text = re.sub(pat, placeholder, text)
        return text

    once = redact(s)
    assert redact(once) == once


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_hash_split_python_twin_total_and_stable(doc_id):
    """The md5-bucket rule (sampling._bucket's exact arithmetic) assigns
    every id a bucket in range and a split label, independent of anything
    but the id."""
    import hashlib

    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10000
    assert 0 <= b < 10000
    label = "train" if b < 8000 else ("val" if b < 9000 else "test")
    assert label in ("train", "val", "test")
