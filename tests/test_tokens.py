"""Golden + property tests for the token kernels.

Golden vectors are lifted from the reference's own tests so byte-parity
with `/root/reference/src/pprl/embedder/features.py` is pinned
(FIXTURES.md §3); property tests mirror the reference's Hypothesis suite
(`/root/reference/test/embedder/test_features.py:28-57,79-116`).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pprl_spark.functions import tokens

NAMES = st.text(alphabet=string.ascii_letters + " -'.", min_size=0, max_size=30)


def test_split_string_underscore_golden():
    # features.py docstring examples (features.py:17-22)
    assert tokens.split_string_underscore("dave  william johnson") == [
        "_dave_",
        "_william_",
        "_johnson_",
    ]
    assert tokens.split_string_underscore("Francesca__Hogan-O'Malley") == [
        "_Francesca_",
        "_Hogan_",
        "_O'Malley_",
    ]


def test_skip_grams_golden():
    # features.py:73-79 docstring example
    toks = tokens.split_string_underscore("dave james")
    assert list(tokens.gen_skip_grams(toks)) == [
        "_a", "dv", "ae", "v_", "_a", "jm", "ae", "ms", "e_",
    ]


def test_doris_smith_bigrams_golden():
    # test_embedder.py:131-164 golden
    assert tokens.name_features("doris smith", ngram_length=[2]) == [
        "_d", "do", "or", "ri", "is", "s_", "_s", "sm", "mi", "it", "th", "h_",
    ]


def test_dave_wilson_all_features_golden():
    # test_features.py:174-246 golden (ngrams + skip-grams + metaphone)
    got = set(
        tokens.name_features(
            "dave wilson", ngram_length=[2], use_gen_skip_grams=True, use_double_metaphone=True
        )
    )
    assert got == {
        "_d", "da", "av", "ve", "e_", "_w", "wi", "il", "ls", "so", "on", "n_",
        "_a", "dv", "ae", "v_", "_i", "wl", "is", "lo", "sn", "o_",
        "ALSN", "FLSN", "TF",
    }


def test_ron_bill_all_features_golden():
    got = set(
        tokens.name_features(
            "ron bill", ngram_length=[2], use_gen_skip_grams=True, use_double_metaphone=True
        )
    )
    assert got == {
        "_r", "ro", "on", "n_", "_b", "bi", "il", "ll", "l_",
        "_o", "rn", "o_", "_i", "bl", "PL", "RN",
    }


def test_sex_features_golden():
    # test_features.py:352-361: ["Ostrich","Male",None,"female",42] ->
    # [["sex<o>"],["sex<m>"],[""],["sex<f>"],[""]]
    assert tokens.sex_features("Ostrich") == ["sex<o>"]
    assert tokens.sex_features("Male") == ["sex<m>"]
    assert tokens.sex_features(None) == [""]
    assert tokens.sex_features("female") == ["sex<f>"]
    assert tokens.sex_features(42) == [""]


def test_dob_features_golden():
    # test_embedder.py:167-189: "01/3/2012" -> day<01>/month<03>/year<2012>
    assert tokens.dob_features("01/3/2012") == ["day<01>", "month<03>", "year<2012>"]
    assert tokens.dob_features("20120301") == ["day<01>", "month<03>", "year<2012>"]
    assert tokens.dob_features("garbage") == []
    assert tokens.dob_features(None, default=["day<01>", "month<01>", "year<2050>"]) == [
        "day<01>", "month<01>", "year<2050>",
    ]


def test_misc_features_golden():
    # features.py:293-330: ints stringified; missing -> scalar ""
    assert tokens.misc_features(42) == ["misc<42>"]
    assert tokens.misc_features("Blue", label="colour") == ["colour<blue>"]
    assert tokens.misc_features("") == ""
    assert tokens.misc_features(None) == ""


def test_shingled_features_golden():
    # test_features.py:487-510 style: label<gram> wrapping, default zz
    got = tokens.shingled_features("russ abbott", ngram_length=[6])
    assert all(g.startswith("zz<") and g.endswith(">") for g in got)
    assert "zz<_russ_>" in got


def test_union_features_missing_semantics():
    # embedder.py:449-454: scalar "" vanishes; [""] contributes ""
    assert set(tokens.union_features([["a", "b"], "", ["b"]])) == {"a", "b"}
    assert set(tokens.union_features([["a"], [""]])) == {"a", ""}


@given(NAMES)
def test_ngram_lengths_property(name):
    toks = tokens.split_string_underscore(name.lower())
    for g in tokens.gen_ngram(toks, [2, 3]):
        assert len(g) in (2, 3)
        assert g != "_"


@given(NAMES)
def test_name_features_deterministic(name):
    assert tokens.name_features(name) == tokens.name_features(name)


@given(st.one_of(st.none(), st.text(max_size=10)))
def test_sex_features_shape(value):
    out = tokens.sex_features(value)
    assert isinstance(out, list) and len(out) == 1
    assert out[0] == "" or (out[0].startswith("sex<") and out[0].endswith(">"))


def test_misc_features_no_data_sentinel():
    # features.py:316-328: replace(""->"no_data").fillna("no_data") then
    # label<no_data> -> "" — a LITERAL no_data value is coded as missing
    assert tokens.misc_features("no_data") == ""
    assert tokens.misc_features("NO_DATA") == ""
    assert tokens.misc_features("nodata") == ["misc<nodata>"]


# ---------------------------------------------------------------------------
# lenient date parsing parity: mirror of the reference's random-date
# property test (test/embedder/test_features.py:248-262) against the
# pd.to_datetime oracle the reference delegates to (features.py:281)
# ---------------------------------------------------------------------------

_DATE_FORMATS = [
    "%Y%m%d", "%d/%m/%Y", "%d-%m-%Y", "%d.%m.%Y", "%Y-%m-%d", "%Y/%m/%d",
    "%d %b %Y", "%d %B %Y", "%b %d %Y", "%B %d, %Y",
    "%d/%m/%y", "%m/%d/%Y", "%Y-%d-%m",
]


@given(
    st.dates(),
    st.sampled_from(_DATE_FORMATS),
    st.booleans(),
)
# no deadline: the first example pays pandas' format-inference warm-up
# (~400ms under a loaded box), which hypothesis otherwise flags as a
# flaky-timing failure when the suite shares the host with Spark jobs
@settings(deadline=None)
def test_dob_features_pandas_parity(date, fmt, dayfirst):
    import pandas as pd

    value = date.strftime(fmt)
    got = tokens.dob_features(value, dayfirst=dayfirst)
    ts = pd.to_datetime(value, errors="coerce", dayfirst=dayfirst)
    expected = (
        []
        if ts is pd.NaT
        else [f"day<{ts.day:02d}>", f"month<{ts.month:02d}>", f"year<{ts.year:04d}>"]
    )
    assert got == expected, (value, fmt, dayfirst)


# ---------------------------------------------------------------------------
# app-registry preset: the reference UI hard-codes NGRAMS=[1,2,3,4] plus
# skip-grams for name columns (src/pprl/app/utils.py:138-139). Golden
# derived by hand from the reference generator loops: gen_ngram iterates
# n outer / token inner / window inner and drops the bare "_" 1-gram
# (features.py:59-65); gen_skip_grams pairs token[i]+token[i+2]
# (features.py:92-95, docstring example "dave james").
# ---------------------------------------------------------------------------


def test_app_preset_name_features_golden():
    from pprl_spark.config import EmbedderConfig

    cfg = EmbedderConfig.app_preset()
    assert cfg.ff_args["name"] == {
        "ngram_length": [1, 2, 3, 4],
        "use_gen_skip_grams": True,
    }
    got = tokens.name_features("Dave Wilson", **cfg.ff_args["name"])
    expected = (
        # 1-grams of _dave_ then _wilson_, bare "_" dropped
        list("dave") + list("wilson")
        # 2-grams
        + ["_d", "da", "av", "ve", "e_"]
        + ["_w", "wi", "il", "ls", "so", "on", "n_"]
        # 3-grams
        + ["_da", "dav", "ave", "ve_"]
        + ["_wi", "wil", "ils", "lso", "son", "on_"]
        # 4-grams
        + ["_dav", "dave", "ave_"]
        + ["_wil", "wils", "ilso", "lson", "son_"]
        # skip 2-grams (reference docstring pattern)
        + ["_a", "dv", "ae", "v_"]
        + ["_i", "wl", "is", "lo", "sn", "o_"]
    )
    assert got == expected
    # the preset changes the checksum, so stage tables embedded under the
    # library default can never be silently reused by an app-preset run
    assert cfg.checksum != EmbedderConfig().checksum


def test_app_preset_embeds(spark):
    from pprl_spark.config import EmbedderConfig
    from pprl_spark.operators.embedding import embed_documents
    from pprl_spark.sources.synthetic import synthesize_documents

    cfg = EmbedderConfig.app_preset()
    out = embed_documents(
        synthesize_documents(spark, 50, "A"), cfg, keep=["doc_id"]
    ).select("doc_id", "bf_indices")
    rows = out.collect()
    assert len(rows) == 50
    # denser features than the [2,3] default => more Bloom indices
    base = embed_documents(
        synthesize_documents(spark, 50, "A"), EmbedderConfig(), keep=["doc_id"]
    ).select("bf_indices").collect()
    assert sum(len(r["bf_indices"]) for r in rows) > sum(
        len(r["bf_indices"]) for r in base
    )
