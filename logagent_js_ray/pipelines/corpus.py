"""Corpus curation pipeline — the documents-table counterpart of the
log flagship: quality gate → benchmark decontamination → exact dedup →
near-dup cluster dedup → deterministic sample → (optional) pack +
partitioned Parquet write.

Every stage is one of the individually oracle-checked operators from
``ops/``; this module is the composition a training-data team actually
runs, with per-stage row accounting so a 100 TB run can report exactly
where documents were dropped. Scale shapes per stage:

  * quality gate / decontamination / sampling — per-batch filters, no
    shuffle (the benchmark set broadcasts once);
  * exact dedup — ONE all-to-all shuffle of the corpus by content
    digest (the unavoidable exchange when the output must be rows;
    the digests-only variant in ops/dedup keeps ids, this one keeps
    documents);
  * near-dup — pair generation shuffles signatures (not texts), the
    component map is small by construction and broadcasts.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from ..ops.dedup import (add_content_hash, connected_components,
                         keep_canonical, ngram_jaccard_pairs)
from ..ops.sampling import hash_sample
from ..ops.text_analysis import (Decontaminator, analyze_batch,
                                 collect_benchmark_ngrams,
                                 gopher_rules_batch)
from ..stages.aggregate import coarse_bucket_array


def exact_dedup_rows(ds: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: int = 256) -> "ray.data.Dataset":
    """Keep-first exact dedup that RETURNS THE ROWS: one shuffle of the
    corpus by content-digest coarse bucket, then a vectorized
    min-id-per-digest pass inside each bucket. Unlike
    :func:`..ops.dedup.exact_dedup_keep_first` (digests-only shuffle,
    returns ids), the row output makes the corpus exchange unavoidable
    — documents move once, grouped by ``hash(md5) % num_buckets`` so
    no task holds more than one bucket."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_db", pa.array(
            coarse_bucket_array(b["content_md5"], num_buckets)))

    def keep_first(g):
        if not len(g):  # empty blocks arrive schema-less
            return g.drop(columns=["_db"], errors="ignore")
        g = g.sort_values(id_col, kind="mergesort")
        return g[~g["content_md5"].duplicated()].drop(columns=["_db"])

    return hashed.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_db").map_groups(keep_first, batch_format="pandas") \
        .map_batches(lambda b: b.drop_columns(["content_md5"]),
                     batch_format="pyarrow")


def curate_corpus(doc_path: str, out_dir: str | None = None,
                  bench: "ray.data.Dataset | None" = None,
                  sample_fraction: float | None = None,
                  seed: int = 42,
                  gopher_kwargs: dict | None = None,
                  jaccard_threshold: tuple = (1, 3),
                  decontam_k: int = 5) -> dict:
    """Run the full curation chain over ``doc_path`` and return a
    summary dict with per-stage surviving row counts (plus the curated
    Dataset under ``"dataset"``; with ``out_dir`` it is also written as
    partitioned Parquet). ``bench`` is the benchmark/eval Dataset to
    decontaminate against (skipped when None); ``sample_fraction``
    None skips sampling."""
    # counted stages MATERIALIZE: Datasets are lazy and count() does
    # not cache, so counting an unmaterialized stage would re-execute
    # everything upstream once per count (several redundant full
    # corpus passes at scale). The materialized blocks hold only the
    # surviving rows of each stage.
    counts: dict[str, int] = {}
    ds = ray.data.read_parquet(doc_path)
    in_cols = list(ds.schema().names)  # caller columns ALL survive
    counts["input"] = ds.count()

    # 1. quality gate (per-batch, no shuffle)
    ds = ds.map_batches(analyze_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b, kw=(gopher_kwargs or {}): gopher_rules_batch(b, **kw),
        batch_format="pyarrow").filter(expr="gopher_ok == True") \
        .select_columns(in_cols).materialize()
    counts["quality"] = ds.count()

    # 2. decontamination (broadcast set, per-batch filter)
    if bench is not None:
        ref = collect_benchmark_ngrams(bench, k=decontam_k)
        ds = ds.map_batches(Decontaminator, fn_constructor_kwargs={
            "bench_ref": ref, "k": decontam_k}, batch_format="pyarrow",
            concurrency=(1, 8)).filter(expr="contaminated == False") \
            .select_columns(in_cols).materialize()
        counts["decontaminated"] = ds.count()

    # 3. exact dedup (one corpus shuffle by digest)
    ds = exact_dedup_rows(ds).materialize()
    counts["exact_dedup"] = ds.count()

    # 4. near-dup cluster dedup (pairs -> components -> keep minimum)
    num, den = jaccard_threshold
    pairs = ngram_jaccard_pairs(ds, threshold_num=num, threshold_den=den)
    comp = connected_components(pairs)
    ds = keep_canonical(ds, comp).materialize()
    counts["near_dedup"] = ds.count()

    # 5. deterministic sample
    if sample_fraction is not None:
        ds = hash_sample(ds, "doc_id", fraction=sample_fraction,
                         seed=seed).materialize()
        counts["sampled"] = ds.count()

    if out_dir:
        from ..sinks import PARQUET_WRITE_OPTS
        from .fused import write_concurrency
        os.makedirs(out_dir, exist_ok=True)
        # cap writers: unlimited write tasks contend on a local disk
        # (CLAUDE.md rule; measured 2x in fused.write_concurrency)
        ds.write_parquet(out_dir, concurrency=write_concurrency(),
                         **PARQUET_WRITE_OPTS)
    return {"counts": counts, "dataset": ds}
