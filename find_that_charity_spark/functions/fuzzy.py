"""Deletion-neighborhood keys for edit-distance-1 term expansion (D2).

The fuzzy query mode (ES ``fuzziness=1`` analog) needs, per query term,
every dictionary term within levenshtein distance 1. A scan-wide
``levenshtein(term, qterm) <= 1`` predicate is a nested loop over the
dictionary — linear in vocabulary size (10^8-10^9 terms at web scale)
per query batch. The SymSpell-style deletion neighborhood turns it into
an equi-join [public: Garbe, SymSpell; Boytsov 2011 survey of
approximate dictionary search]:

    keys(t) = {t} ∪ {t with char i deleted}            (|t|+1 keys)

Two terms at edit distance <= 1 ALWAYS share a key (substitution: both
delete the differing position; insert/delete: the longer term's deletion
equals the shorter term itself; equality: identity key). Sharing a key
only bounds the distance at 2 (e.g. "xab" / "aby" both yield "ab"), so
candidates still get an exact ``levenshtein <= 1`` check — but on the
tiny key-matched set, never the full dictionary.

The build materializes the dictionary's expansion once as the
``fuzzy_keys`` table (key, term — stats-free so streaming refresh can
append new-term keys without a rewrite; fresh df/bucket come from the
live dictionary at query time); query batches collect their own (tiny)
key set and push it into that scan as an IN-list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deletion_keys(term: str) -> list[str]:
    """The term plus each 1-deletion variant, deduplicated, order-stable."""
    return list(dict.fromkeys([term] + [term[:i] + term[i + 1 :] for i in range(len(term))]))


def within_edit1(a: str, b: str) -> bool:
    """Scalar levenshtein(a, b) <= 1 in O(len) (driver-side verify of
    deletion-key candidates — a shared key only bounds the distance at 2)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    used_edit = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
            continue
        if used_edit:
            return False
        used_edit = True
        if la == lb:
            i += 1  # substitution
        j += 1      # (or) insertion into the shorter string
    return True  # any leftover tail char in b is the single edit


def deletion_keys_expr(col: str) -> Column:
    """JVM-side twin of :func:`deletion_keys` (array<string> Column).

    ``array_union`` both prepends the identity key and deduplicates
    (e.g. "aa" has a single distinct deletion), matching the scalar form.
    """
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i-1), substring({col}, i+1, length({col})))))"
    )
