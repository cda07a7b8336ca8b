"""Test helpers: rank-identity comparison with float-tie tolerance."""

from __future__ import annotations


def assert_rank_identical(got, expect, tol=1e-9, msg="", expect_full=None):
    """got/expect: [(key, score)] ranked lists (key = doc_id or url).

    Asserts identical score sequence (within tol) and identical keys, EXCEPT
    that keys whose scores tie (within tol) may permute within the tie group.
    When a tie group straddles the top-k boundary, membership is checked
    against ``expect_full`` (a longer oracle ranking) so any tied candidate
    beyond rank k is accepted at the boundary."""
    full = expect_full if expect_full is not None else expect
    assert len(got) == len(expect), f"{msg}: length {len(got)} != {len(expect)}"
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expect)):
        assert abs(gs - es) <= tol * max(1.0, abs(es)), (
            f"{msg}: rank {i} score {gs} != {es}"
        )
        if gd != ed:
            group = {
                d for d, s in full if abs(s - es) <= tol * max(1.0, abs(es))
            }
            assert gd in group, f"{msg}: rank {i} key {gd} != {ed} (not a tie swap)"
