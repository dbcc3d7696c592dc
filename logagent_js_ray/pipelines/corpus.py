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

Accounting is SINGLE-PASS (round-3 verdict item #3): surviving-row
counts stream into a zero-CPU counter actor from inside the batch
passes that run anyway, instead of a ``.materialize() + count()`` per
stage (the round-3 shape held the corpus in the object store 4-5
times). The corpus materializes exactly once mid-pipeline — before
near-dup pair generation, which consumes the surviving rows twice
(pair stream + canonical keep) — plus the returned deliverable.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

import ray
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


@ray.remote(num_cpus=0)
class StageCounter:
    """Keyed surviving-row counter — the CubeAccumulator pattern
    (pipelines/fused.py:47) with a scalar payload: per-(stage,
    batch-key) last-write-wins makes task retries idempotent, so the
    counts are exact even when Ray re-executes a batch."""

    def __init__(self):
        pa.set_cpu_count(1)  # actor rule (CLAUDE.md)
        self.parts: dict[tuple, int] = {}

    def add(self, stage: str, key: str, n: int) -> None:
        self.parts[(stage, key)] = n

    def totals(self) -> dict:
        out: dict[str, int] = {}
        for (stage, _), n in self.parts.items():
            out[stage] = out.get(stage, 0) + n
        return out


def _count_key(b: pa.Table, id_col: str) -> str:
    """Content fingerprint of a batch, stable across retries — md5 over
    the IPC-framed id column (IPC, not raw buffers: zero-copy slices
    share parent buffers; see pipelines/fused._batch_key)."""
    h = hashlib.md5()
    sink = pa.BufferOutputStream()
    kt = b.select([id_col])
    with pa.ipc.new_stream(sink, kt.schema) as w:
        w.write_table(kt)
    h.update(sink.getvalue())
    h.update(str(b.num_rows).encode())
    return h.hexdigest()


def counter_pool(n: int = 4) -> list:
    """N zero-CPU StageCounter shards (round-4 verdict item #6): every
    batch routes its count to ``shards[crc32(batch_key) % N]``, so no
    single actor mailbox sits on the critical path of every batch at
    scale; totals merge at read (:func:`counter_totals`). Retry safety
    is preserved — a batch's key always routes to the same shard, so
    last-write-wins dedup still holds per (stage, key)."""
    return [StageCounter.remote() for _ in range(n)]


def counter_totals(accs) -> dict:
    """Merged per-stage totals across counter shards."""
    out: dict[str, int] = {}
    for t in ray.get([a.totals.remote() for a in accs]):
        for stage, n in t.items():
            out[stage] = out.get(stage, 0) + n
    return out


def _counted(accs, stage: str, id_col: str):
    """Pass-through batch fn that reports surviving rows for ``stage``
    to the batch-key-hashed counter shard. The add is BLOCKING so
    downstream materialization returning implies every partial landed
    (fire-and-forget would race totals())."""
    import zlib
    accs = accs if isinstance(accs, list) else [accs]

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows:
            key = _count_key(b, id_col)
            shard = accs[zlib.crc32(key.encode()) % len(accs)]
            ray.get(shard.add.remote(stage, key, b.num_rows))
        return b
    return fn


def _substr_as_text(in_cols: list):
    """Replace ``text`` with the ExactSubstr-cleaned text and restore
    the caller's column set (rename_columns-by-dict needs newer
    pyarrow, so swap by position)."""

    def fn(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["text", "n_spans", "removed_chars"])
        b = b.rename_columns(["text" if c == "text_clean" else c
                              for c in b.column_names])
        return b.select(in_cols)
    return fn


# declared-approximation preset for a web-scale corpus: 8-byte hashed
# shingles through the only all-to-all (2^-64 per-shingle collision
# odds, ~2.4x fewer exchange bytes measured in BASELINE.md) and a
# stop-shingle posting cap (a shingle shared by >max_posting docs is
# boilerplate, and its posting list pairs O(n²) — the standard guard).
WEB_SCALE_PAIR_KWARGS = {"hashed_shingles": True, "max_posting": 10_000}


def curate_corpus(doc_path: str, out_dir: str | None = None,
                  bench: "ray.data.Dataset | None" = None,
                  sample_fraction: float | None = None,
                  seed: int = 42,
                  gopher_kwargs: dict | None = None,
                  jaccard_threshold: tuple = (1, 3),
                  decontam_k: int = 5,
                  scale: str = "standard",
                  badwords: tuple | None = None,
                  lm_reference: "ray.data.Dataset | None" = None,
                  lm_keep: tuple = ("head", "middle"),
                  exact_substr: bool = False,
                  substr_min_len: int = 30,
                  dsir_target: "ray.data.Dataset | None" = None,
                  dsir_keep_denominator: int = 4,
                  id_col: str = "doc_id") -> dict:
    """Run the full curation chain over ``doc_path`` and return a
    summary dict with per-stage surviving row counts (plus the curated
    Dataset under ``"dataset"``; with ``out_dir`` it is also written as
    partitioned Parquet). ``bench`` is the benchmark/eval Dataset to
    decontaminate against (skipped when None); ``sample_fraction``
    None skips sampling.

    ``scale="web"`` flips the documented 100-TB configuration in one
    flag (:data:`WEB_SCALE_PAIR_KWARGS`): hashed shingle exchange and
    the ``max_posting`` stop-shingle guard for near-dup pair
    generation. Output is identical to ``"standard"`` on any corpus
    whose posting lists stay under the guard (asserted in
    tests/test_corpus.py); above it, the dropped shingles are the
    declared approximation.

    Optional stages compose the rest of the modern recipe (each is an
    individually oracle-checked operator; all default OFF, leaving the
    driver-checked base chain byte-identical):

      * ``badwords`` — C4 blocklist gate right after the Gopher gate
        (ops/cleaning.badwords_filter_batch): drop any document with a
        single blocklist hit. Per-batch kernel, no shuffle.
      * ``lm_reference`` — CCNet LM quality filter after the Gopher
        gate (ops/lm_quality): train the integer bigram LM on the
        reference, bucket by the reference's own percentile cutoffs,
        keep ``lm_keep`` buckets. Per-batch, no shuffle.
      * ``exact_substr`` — ExactSubstr duplicate-span removal between
        exact and fuzzy dedup (ops/substr, the Lee et al. ordering);
        documents whose text is entirely duplicated elsewhere drop.
      * ``dsir_target`` — final DSIR selection (ops/importance): keep
        the exact top n//``dsir_keep_denominator`` by importance
        weight toward the target distribution.
    """
    if scale not in ("standard", "web"):
        raise ValueError(f"scale must be 'standard' or 'web', got "
                         f"{scale!r}")
    pair_kwargs = dict(WEB_SCALE_PAIR_KWARGS) if scale == "web" else {}
    acc = counter_pool()
    ds = ray.data.read_parquet(doc_path)
    in_cols = list(ds.schema().names)  # caller columns ALL survive
    counts: dict[str, int] = {"input": ds.count()}  # parquet metadata

    # 1. quality gate (per-batch, no shuffle)
    ds = ds.map_batches(analyze_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b, kw=(gopher_kwargs or {}): gopher_rules_batch(b, **kw),
        batch_format="pyarrow").filter(expr="gopher_ok == True") \
        .select_columns(in_cols) \
        .map_batches(_counted(acc, "quality", id_col),
                     batch_format="pyarrow")

    # 1a. C4 bad-words blocklist gate (per-batch kernel, no shuffle)
    if badwords is not None:
        from ..ops.cleaning import badwords_filter_batch
        ds = ds.map_batches(
            lambda b, w=tuple(badwords): badwords_filter_batch(b,
                                                               words=w),
            batch_format="pyarrow") \
            .filter(expr="badwords_ok == True") \
            .select_columns(in_cols) \
            .map_batches(_counted(acc, "badwords", id_col),
                         batch_format="pyarrow")

    # 1b. CCNet LM quality filter (per-batch, no shuffle; the LM and
    # cutoffs are reference-derived broadcast artifacts)
    if lm_reference is not None:
        from ..ops.lm_quality import (add_ppl_bucket, reference_cutoffs,
                                      score_cross_entropy,
                                      train_bigram_lm)
        lm = train_bigram_lm(lm_reference)
        t1, t2 = reference_cutoffs(lm_reference, lm)
        keep_expr = " or ".join(f"ppl_bucket == '{b}'" for b in lm_keep)
        ds = add_ppl_bucket(score_cross_entropy(ds, ray.put(lm)), t1, t2) \
            .filter(expr=keep_expr) \
            .select_columns(in_cols) \
            .map_batches(_counted(acc, "lm_quality", id_col),
                         batch_format="pyarrow")

    # 2. decontamination (broadcast set, per-batch filter)
    if bench is not None:
        ref = collect_benchmark_ngrams(bench, k=decontam_k)
        ds = ds.map_batches(Decontaminator, fn_constructor_kwargs={
            "bench_ref": ref, "k": decontam_k}, batch_format="pyarrow",
            concurrency=(1, 8)).filter(expr="contaminated == False") \
            .select_columns(in_cols) \
            .map_batches(_counted(acc, "decontaminated", id_col),
                         batch_format="pyarrow")

    # 3. exact dedup (one corpus shuffle by digest), then the ONE
    # mid-pipeline materialization: near-dup consumes these rows twice
    # (pair generation + canonical keep), so they must be stable. The
    # quality/decontamination counters stream in during this pass.
    ds = exact_dedup_rows(ds, id_col=id_col).materialize()
    counts["exact_dedup"] = ds.count()  # block metadata, no pass

    # 3b. ExactSubstr duplicate-span removal (ops/substr) between exact
    # and fuzzy dedup — the Lee et al. ordering. Documents reduced to
    # nothing (fully duplicated elsewhere) drop; the cut rows replace
    # the corpus and re-materialize (near-dup still consumes them
    # twice).
    if exact_substr:
        from ..ops.substr import exact_substr_dedup
        ds = exact_substr_dedup(ds, id_col=id_col, text_col="text",
                                min_len=substr_min_len) \
            .filter(expr="text_clean != ''") \
            .map_batches(_substr_as_text(in_cols),
                         batch_format="pyarrow") \
            .map_batches(_counted(acc, "substr", id_col),
                         batch_format="pyarrow").materialize()

    # 4. near-dup cluster dedup (pairs -> components -> keep minimum)
    num, den = jaccard_threshold
    pairs = ngram_jaccard_pairs(ds, id_col=id_col, threshold_num=num,
                                threshold_den=den, **pair_kwargs)
    comp = connected_components(pairs)
    out = keep_canonical(ds, comp, id_col=id_col) \
        .map_batches(_counted(acc, "near_dedup", id_col),
                     batch_format="pyarrow")

    # 5. deterministic sample
    if sample_fraction is not None:
        out = hash_sample(out, id_col, fraction=sample_fraction,
                          seed=seed) \
            .map_batches(_counted(acc, "sampled", id_col),
                         batch_format="pyarrow")

    # 6. DSIR selection toward the target distribution (exact top
    # n//k by integer importance weight; sort is the honest cost of
    # exact top-k — see ops/importance for the quantile-threshold
    # approximation at extreme scale)
    if dsir_target is not None:
        from ..ops.importance import dsir_select
        out = dsir_select(out, dsir_target, id_col=id_col,
                          keep_denominator=dsir_keep_denominator) \
            .map_batches(lambda b: b.drop_columns(["dsir_w"]),
                         batch_format="pyarrow") \
            .map_batches(_counted(acc, "dsir", id_col),
                         batch_format="pyarrow")

    # the deliverable executes keep -> sample -> counters in one pass
    out = out.materialize()
    if out_dir:
        from ..sinks import PARQUET_WRITE_OPTS
        from .fused import write_concurrency
        os.makedirs(out_dir, exist_ok=True)
        # cap writers: unlimited write tasks contend on a local disk
        # (CLAUDE.md rule; measured 2x in fused.write_concurrency);
        # writing the materialized blocks recomputes nothing
        out.write_parquet(out_dir, concurrency=write_concurrency(),
                          **PARQUET_WRITE_OPTS)
    counts.update(counter_totals(acc))
    # a stage that dropped EVERY row posted no partials — it must
    # still report 0 (a zero-surviving stage is not a disabled stage)
    enabled = (["quality"]
               + (["badwords"] if badwords is not None else [])
               + (["lm_quality"] if lm_reference is not None else [])
               + (["decontaminated"] if bench is not None else [])
               + (["substr"] if exact_substr else [])
               + ["near_dedup"]
               + (["sampled"] if sample_fraction is not None else [])
               + (["dsir"] if dsir_target is not None else []))
    for st in enabled:
        counts.setdefault(st, 0)
    order = ["input", "quality", "badwords", "lm_quality",
             "decontaminated", "exact_dedup", "substr", "near_dedup",
             "sampled", "dsir"]
    counts = {k: counts[k] for k in order if k in counts}
    return {"counts": counts, "dataset": out}
