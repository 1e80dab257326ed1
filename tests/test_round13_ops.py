"""Round-13 regression tests: the four judge-advice fixes (r12 ADVICE)
plus the new round-13 operators' unit pins."""

from __future__ import annotations

import re

import pytest


# ---------------------------------------------------------------- ADVICE 1
def test_drop_pattern_no_cross_tag_match():
    # '<style>a</script>b</style>' must drop through '</style>', not
    # stop at the first '</script>' and leave 'b</style>' remnants.
    from aeon_mecha_spark.datapipe.extraction import DROP_PATTERN

    html = "keep1 <style>a</script>b</style> keep2"
    cleaned = re.sub(DROP_PATTERN, " ", html)
    assert "b" not in cleaned and "</style>" not in cleaned
    assert "keep1" in cleaned and "keep2" in cleaned
    # the ordinary cases still drop
    assert re.sub(DROP_PATTERN, " ", "<script>x</script>y").strip() == "y"
    assert re.sub(DROP_PATTERN, " ", "<style>x</style>y").strip() == "y"
    assert re.sub(DROP_PATTERN, " ", "<!--x-->y").strip() == "y"
    # RE2-safety: no backreferences or lookaround in the pattern
    assert "\\1" not in DROP_PATTERN and "(?=" not in DROP_PATTERN


def test_drop_pattern_matches_mirror_on_cross_tag_html(spark):
    # The differential-fuzz mirror (test_round12_ops._py_html_extract)
    # uses a backreference; the engine pattern uses per-tag
    # alternatives — assert they agree on the adversarial case too.
    from test_round12_ops import _py_html_extract

    from aeon_mecha_spark.datapipe.extraction import html_extract

    html = (
        "<p>alpha beta gamma delta epsilon zeta</p>"
        "<style>a</script>b</style>"
        "<p>keep this long enough sentence here ok</p>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id int, html string")
    got = html_extract(docs, min_chars=10).collect()[0]
    exp_text, exp_kept, exp_total = _py_html_extract(html, min_chars=10)
    assert got["text"] == exp_text
    assert got["n_blocks_kept"] == exp_kept
    assert got["n_blocks_total"] == exp_total
    assert "b</style>" not in got["text"]


# ---------------------------------------------------------------- ADVICE 2
def test_dsir_select_keeps_cache_handles(spark):
    from pyspark.sql import functions as F

    from aeon_mecha_spark.datapipe import curation as C

    docs = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, "le chat", "fr"), (3, "a dog ran", "en")],
        "doc_id int, text string, lang string",
    )
    sel = C.dsir_select(docs, F.col("lang") == "en", k=2, n_buckets=8)
    handles = getattr(sel, "_aeon_cached", ())
    assert handles, "orderBy/limit dropped the _aeon_cached release handles"
    assert len(sel.collect()) == 2
    from aeon_mecha_spark.util import release_cached

    release_cached(sel)


# ---------------------------------------------------------------- ADVICE 3
def test_stss_recovery_point_open_gop_is_not_an_error():
    # Spec-valid H.264 open GOP: stss may list a recovery-point
    # (non-IDR) sample as sync. stss is authoritative; only the reverse
    # disagreement (scan says IDR, stss says non-sync) is corruption.
    from test_round12_ops import _avc1_mp4

    from aeon_mecha_spark.datapipe import nalcodec as N

    open_gop, _ = _avc1_mp4(sync=[1, 2, 4])  # sample 2 is a P AU
    idx = N.mp4_keyframe_index(open_gop)
    assert [f["is_keyframe"] for f in idx] == [True, True, False, True]

    bad, _ = _avc1_mp4(sync=[2])  # omits the IDR samples 1 and 4
    with pytest.raises(ValueError, match="non-sync.*IDR"):
        N.mp4_keyframe_index(bad)


# ---------------------------------------------------------------- ADVICE 4
def test_sample_ranges_missing_stsz_raises_by_name():
    from test_round12_ops import _avc1_mp4

    from aeon_mecha_spark.datapipe import mp4codec as M

    payload, _ = _avc1_mp4()
    assert payload.count(b"stsz") == 1
    with pytest.raises(ValueError, match="stsz"):
        M.sample_ranges(payload.replace(b"stsz", b"free"))
    with pytest.raises(ValueError, match="stz2"):
        M.sample_ranges(payload.replace(b"stsz", b"stz2"))
