"""Test helpers: rank-identity comparison with float-tie tolerance."""

from __future__ import annotations


def assert_rank_identical(got, expect, tol=1e-9, msg=""):
    """got/expect: [(doc_id, score)] ranked lists. Asserts identical ranking
    and scores within tol; docs whose scores tie within tol may appear in any
    order among themselves ONLY if both systems also tie (we still require
    doc_id-asc tie-break, so order must match exactly unless scores are
    bitwise-tied across systems)."""
    assert len(got) == len(expect), f"{msg}: length {len(got)} != {len(expect)}"
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expect)):
        assert abs(gs - es) <= tol * max(1.0, abs(es)), (
            f"{msg}: rank {i} score {gs} != {es}"
        )
        if gd != ed:
            # allowed only if this is a tie group in expect AND the swapped
            # doc appears in the same tie group
            group = {d for d, s in expect if abs(s - es) <= tol * max(1.0, abs(es))}
            assert gd in group, f"{msg}: rank {i} doc {gd} != {ed} (not a tie swap)"
