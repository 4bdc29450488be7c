"""Token-counter invariants (core/tokens.py)."""

import re

from hypothesis import given, settings, strategies as st

from open_parse_spark.core.tokens import _PRETOKEN_RE, num_tokens


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_subn_count_equals_findall_count(s):
    # the fast path counts matches with subn(""); it must equal the
    # straightforward findall count for any input
    assert _PRETOKEN_RE.subn("", s)[1] == len(_PRETOKEN_RE.findall(s))


def test_num_tokens_basics():
    assert num_tokens(None) == 0
    assert num_tokens("") == 0
    assert num_tokens("word") == 1
    assert num_tokens("a" * 8) == 2  # 4-char chunks
    assert num_tokens("12345") == 2  # <=3-digit chunks
    assert num_tokens("it's") == 2  # word + contraction


def test_num_tokens_long_string_uncached_path():
    long = "word " * 1000  # > _CACHE_MAX_LEN chars -> direct path
    assert num_tokens(long) == num_tokens_reference(long)


def num_tokens_reference(s):
    return len(re.findall(_PRETOKEN_RE, s))
