"""Deterministic dedup-benchmark corpus with SCALE-INVARIANT duplicate
structure — the property that makes a two-scale wall-growth measurement
meaningful. (A template-heavy web corpus has true near-dup pair counts
that grow quadratically with corpus size; no algorithm can report those
pairs in linear time, so it cannot evidence linear scaling. This corpus
pins the duplicate structure instead.)

Four deterministic classes over ``spark.range(n)`` (pure expressions,
generated on the executors — no driver materialization):

* **unique docs** — 120-319 words, each word an md5 slice of
  ``(doc_id, position)``: no cross-document shingle collisions.
* **boilerplate floods** — ids ``% 100 == 0`` collapse onto 5 families of
  byte-identical text; family size = n/500 grows with the corpus and
  CROSSES ``DEFAULT_BUCKET_CAP`` (1000) between 100k (200/family) and 1M
  (2000/family) docs, so the sf1 run demonstrates the flood guard doing
  its job: the families vanish from the LSH pair join and are fully
  handled by the linear exact-dup pass.
* **near-dups** — every 20th unique doc re-emitted (id + 10n) with its
  last 3 words dropped: Jaccard ≈ (w-5)/(w-2) ≈ 0.97, well above the 0.8
  verify threshold; exactly one extra candidate pair per injected doc.
* **exact dups** — every 25th unique doc re-emitted verbatim (id + 20n).

Totals: ~1.09·n documents, near+exact pair counts ∝ n — so wall growth
between two corpus sizes should track the size ratio (log factors
allowed), which is the 100 TB scaling argument the bench records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BOILER_FAMILIES = 5
BOILER_WORDS = 240

# Every 7th word is an English stopword so ordinary docs pass the Gopher
# keep rule (which requires at least one stopword); docs built with
# stopwords=False fail it and populate the low_quality verdict class.
# A 3-word shingle can contain at most one stopword, so the salt words
# still make every shingle unique to its document.
_STOPWORDS = ("the", "and", "of", "to", "in", "is", "it", "that")


def _salt_words(
    prefix: F.Column, count: F.Column | int, stopwords: bool = True
) -> F.Column:
    """`count` words, each the first 8 hex chars of md5(prefix ':' i),
    with every 7th replaced by a rotating stopword when enabled."""
    n = F.lit(count) if isinstance(count, int) else count
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])

    def word(i):
        # translate digits → letters so words are alphabetic (the Gopher
        # mean-word-length rule counts letters only; raw hex averages
        # under its lower bound).
        salt = F.translate(
            F.substring(F.md5(F.concat(prefix, F.lit(":"), i.cast("string"))), 1, 8),
            "0123456789",
            "ghijklmnop",
        )
        if not stopwords:
            return salt
        return F.when(
            i % 7 == 0,
            F.element_at(stop, (F.pmod(i / 7, len(_STOPWORDS)) + 1).cast("int")),
        ).otherwise(salt)

    return F.transform(F.sequence(F.lit(1), n), word)


def synth_dedup_corpus(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """(doc_id, text) rows; see module docstring for the class layout."""
    base = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    base = base.select(F.col("id").alias("doc_id"))

    is_boiler = F.pmod("doc_id", 100) == 0
    family = F.pmod(F.col("doc_id") / 100, BOILER_FAMILIES).cast("int")
    nw = (F.lit(120) + F.pmod("doc_id", 200)).cast("int")

    # ids % 13 == 5 get no stopwords → fail the Gopher keep rule →
    # populate the low_quality verdict class (scale-invariant fraction).
    no_stop = F.pmod("doc_id", 13) == 5

    def text_expr(word_cut: int = 0):
        uniq_prefix = F.concat(F.lit("doc"), F.col("doc_id").cast("string"))
        boiler_prefix = F.concat(F.lit("boiler"), family.cast("string"))
        words = F.when(
            is_boiler, _salt_words(boiler_prefix, BOILER_WORDS)
        ).when(
            no_stop, _salt_words(uniq_prefix, nw - word_cut, stopwords=False)
        ).otherwise(_salt_words(uniq_prefix, nw - word_cut))
        return F.array_join(words, " ")

    docs = base.select("doc_id", text_expr().alias("text"))
    near = (
        base.filter((F.pmod("doc_id", 20) == 0) & ~is_boiler)
        .select("doc_id", text_expr(word_cut=3).alias("text"))
        .select((F.col("doc_id") + 10 * n).alias("doc_id"), "text")
    )
    exact = (
        base.filter((F.pmod("doc_id", 25) == 0) & ~is_boiler)
        .select("doc_id", text_expr().alias("text"))
        .select((F.col("doc_id") + 20 * n).alias("doc_id"), "text")
    )
    return docs.unionAll(near).unionAll(exact)
