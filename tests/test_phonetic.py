"""Double Metaphone golden vectors.

Reference pins these through the public `metaphone` package
(`/root/reference/test/embedder/test_features.py:120`): dave -> TF,
wilson -> ALSN/FLSN, ron -> RN, bill -> PL.
"""

import string

from hypothesis import given
from hypothesis import strategies as st

from pprl_spark.functions.phonetic import double_metaphone


def test_reference_goldens():
    assert double_metaphone("dave") == ("TF", "")
    assert double_metaphone("wilson") == ("ALSN", "FLSN")
    assert double_metaphone("ron") == ("RN", "")
    assert double_metaphone("bill") == ("PL", "")


def test_common_names():
    assert double_metaphone("smith") == ("SM0", "XMT")
    assert double_metaphone("thomas") == ("TMS", "")
    assert double_metaphone("john") == ("JN", "AN")
    assert double_metaphone("katherine") == ("K0RN", "KTRN")
    assert double_metaphone("jose") == ("HS", "")
    assert double_metaphone("school") == ("SKL", "")
    assert double_metaphone("wright") == ("RT", "")


def test_empty_and_non_alpha():
    assert double_metaphone("") == ("", "")
    assert double_metaphone("123") == ("", "")


@given(st.text(alphabet=string.ascii_letters + "'- ", max_size=20))
def test_never_crashes_and_uppercase(word):
    p, s = double_metaphone(word)
    assert isinstance(p, str) and isinstance(s, str)
    assert all(c.isupper() or c == "0" for c in p)
