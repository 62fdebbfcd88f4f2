"""INCR_PATH_GLOB matcher parity with org.apache.hadoop.fs.GlobPattern.

The reference compiles ``new GlobPattern("*" + glob)`` and full-matches file
paths (IncrementalRelation.scala:141-143; MergeOnReadIncrementalRelation
.scala:177-186).  GlobPattern's ``*`` compiles to ``.*`` — it crosses ``/``
(path-segment splitting is a globStatus concern, not GlobPattern's) — and it
supports ``?``, ``[...]``/``[!...]`` sets, ``{a,b}`` alternation and ``\\``
escapes.  These tests pin that exact behavior, including the cases where it
deliberately differs from segment-wise Hadoop globStatus matching.

No SparkSession needed — pure driver-side planning code.
"""

import re
from types import SimpleNamespace

from incubator_hudi_spark.fsview import _hadoop_glob_regex, filter_slices_by_glob


def _m(glob: str, path: str) -> bool:
    """Reference shape: GlobPattern('*' + glob).matches(path)."""
    return re.compile(".*" + _hadoop_glob_regex(glob)).fullmatch(path) is not None


def test_star_crosses_slash_like_globpattern():
    # GlobPattern '*' == '.*' — '03/*' DOES match '2024-03/...' in the
    # reference too ('*03/*' -> '.*03/.*'); pinned as parity, not a bug.
    assert _m("03/*", "2024-03/f1.parquet")
    assert _m("2016/*/*/*", "file:/base/2016/03/15/f.parquet")
    # and the trailing '*' crosses '/' as well (unlike fnmatch-per-segment)
    assert _m("2016/*", "2016/03/15/f.parquet")


def test_question_mark_and_sets():
    assert _m("2024-0?/*", "2024-03/f.parquet")
    assert not _m("2024-0?/*", "2024-13/f.parquet")
    assert _m("2024-0[13]/*", "2024-01/f.parquet")
    assert not _m("2024-0[13]/*", "2024-02/f.parquet")
    assert _m("2024-0[!2]/*", "2024-03/f.parquet")
    assert not _m("2024-0[!2]/*", "2024-02/f.parquet")


def test_curly_alternation_and_escape():
    # GlobPattern supports {a,b} alternation — fnmatch does not
    assert _m("2024-{01,02}/*", "2024-02/f.parquet")
    assert not _m("2024-{01,02}/*", "2024-03/f.parquet")
    # escaped wildcard is a literal
    assert _m(r"f\*x/*", "f*x/a.parquet")
    assert not _m(r"f\*x/*", "fyx/a.parquet")
    # regex metacharacters in the glob are literals
    assert _m("a.b/*", "a.b/f.parquet")
    assert not _m("a.b/*", "aXb/f.parquet")


def test_escaped_bracket_inside_set():
    # GlobPattern handles BACKSLASH before set logic: '[\]]' is a set
    # holding a literal ']'
    assert _m(r"a[\]]b/*", "a]b/f.parquet")
    assert not _m(r"a[\]]b/*", "axb/f.parquet")
    assert _m(r"[a\]b]x/*", "ax/f.parquet")
    assert _m(r"[a\]b]x/*", "]x/f.parquet")
    assert _m(r"[a\]b]x/*", "bx/f.parquet")
    assert not _m(r"[a\]b]x/*", "cx/f.parquet")
    # ']' first in the set is literal too; ranges still work
    assert _m("f[]]g/*", "f]g/f.parquet")
    assert _m("202[0-4]-*/*", "2024-03/f.parquet")
    assert not _m("202[0-4]-*/*", "2025-03/f.parquet")


def test_anchoring_full_match():
    # full match: the glob must consume the path to its END (only the
    # leading '*' is implicit) — 'f.parquet' can't match a longer tail
    assert _m("f.parquet", "2024-03/f.parquet")
    assert not _m("f.parquet", "2024-03/f.parquet.crc")


def _slice(partition, bases=(), logs=()):
    return SimpleNamespace(
        partition=partition,
        base_files=[SimpleNamespace(path=f"/x/{b}") for b in bases],
        log_files=[SimpleNamespace(path=f"/x/{l}") for l in logs])


def test_filter_slices_granularity_follows_mor_reference():
    """A slice is kept/dropped on its BASE file's path; log-only slices use
    the newest log file — MergeOnReadIncrementalRelation.scala:180-185."""
    with_base = _slice("2024-03", bases=["b1.parquet"],
                       logs=["nomatch.log.1"])
    log_only = _slice("2024-03", logs=["old.log.1", "d2.log.2"])
    other = _slice("2023-12", bases=["b2.parquet"])

    kept = filter_slices_by_glob([with_base, log_only, other], "2024-*/*")
    assert kept == [with_base, log_only]

    # base decides even when a log would match: glob targets the log name,
    # slice with a base is dropped (reference tests base when present)...
    kept = filter_slices_by_glob([with_base, log_only], "*.log.*")
    # ...and the log-only slice matches on its NEWEST log file only
    assert kept == [log_only]
    assert filter_slices_by_glob([log_only], "*old.log.*") == []

    # no glob → identity
    assert filter_slices_by_glob([with_base], None) == [with_base]


# ---- property tests (model-based) -----------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HYP = True
except ImportError:                                   # pragma: no cover
    _HYP = False

if _HYP:
    import fnmatch

    _seg_chars = st.sampled_from("ab3-._")
    _glob_seg = st.text(alphabet=st.sampled_from("ab3*?."), min_size=0,
                        max_size=4)
    _path_seg = st.text(alphabet=_seg_chars, min_size=1, max_size=4)

    @settings(max_examples=300, deadline=None)
    @given(glob_segs=st.lists(_glob_seg, min_size=1, max_size=3),
           path_segs=st.lists(_path_seg, min_size=1, max_size=4))
    def test_star_question_subset_equals_fnmatch(glob_segs, path_segs):
        """On globs of only literals/*/?, GlobPattern('*'+g) ≡ fnmatch
        with '*'+g: both compile * -> .* (crossing '/') and ? -> . —
        fnmatch is the independent model for that subset."""
        glob = "/".join(glob_segs)
        path = "/".join(path_segs)
        want = fnmatch.fnmatchcase(path, "*" + glob)
        assert _m(glob, path) == want, (glob, path)

    @settings(max_examples=200, deadline=None)
    @given(alts=st.lists(st.text(alphabet=st.sampled_from("ab3"),
                                 min_size=0, max_size=3),
                         min_size=1, max_size=3),
           prefix=st.text(alphabet=st.sampled_from("ab3*?"), max_size=3),
           path_segs=st.lists(_path_seg, min_size=1, max_size=3))
    def test_braces_equal_or_of_expansions(alts, prefix, path_segs):
        """{x,y,z} must match exactly when one expanded glob matches."""
        glob = prefix + "{" + ",".join(alts) + "}/*"
        path = "/".join(path_segs)
        want = any(_m(prefix + a + "/*", path) for a in alts)
        assert _m(glob, path) == want, (glob, path)
