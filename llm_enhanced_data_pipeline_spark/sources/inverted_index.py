"""Inverted-index abstract reconstruction (SURVEY.md §2.1 S10).

OpenAlex delivers abstracts as ``map<word, positions[]>``; the
reference rebuilds the text by ordering words by position
(Data_Collection/paper_collection.ipynb cell 10 `reconstruct_abstract`).

Spark-first: pure higher-order functions — explode the map, flatten
positions, sort (position, word) pairs, join with spaces. No UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def build_inverted_index(text_tokens: Column) -> Column:
    """tokens → map<word, positions[]> (the OpenAlex encoding).

    Positions are 0-based token indexes.
    """
    pairs = F.transform(
        text_tokens, lambda w, i: F.struct(w.alias("word"), i.alias("pos"))
    )
    grouped = F.map_from_entries(
        F.transform(
            F.array_distinct(F.transform(text_tokens, lambda w: w)),
            lambda w: F.struct(
                w.alias("key"),
                F.transform(
                    F.filter(pairs, lambda p: p["word"] == w), lambda p: p["pos"]
                ).alias("value"),
            ),
        )
    )
    return grouped


def reconstruct_text(index: Column) -> Column:
    """map<word, positions[]> → original text (space-joined by position)."""
    entries = F.flatten(
        F.transform(
            F.map_entries(index),
            lambda kv: F.transform(
                kv["value"], lambda p: F.struct(p.alias("pos"), kv["key"].alias("word"))
            ),
        )
    )
    ordered = F.array_sort(entries)
    return F.concat_ws(" ", F.transform(ordered, lambda s: s["word"]))
