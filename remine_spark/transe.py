"""ReMine-Global: TransE-style cohesiveness scoring (SURVEY §2 M12/M13, J7, W1).

The reference consumes externally-trained embeddings (postprocessing.py:7-25;
the trainer is absent from the repo — utils.py:236-240 only preps its corpus)
and ranks tuples by ‖e_subj + mean(e_rel) − e_obj‖₁ (postprocessing.py:27-55).
Per the north star this engine trains those embeddings itself with the
translating objective s + p ≈ o:

- training edges: tuples exploded to (subj, rel, obj)
- margin ranking loss, L1 distance, head/tail corruption negatives
- mini-batch SGD where each epoch is one deterministic sample of the edge
  table; an Arrow mapInPandas kernel emits compacted per-batch gradient
  partials which a JVM-side `groupBy(kind, idx)` elementwise pre-sum
  (zip_with fold — the log-fan-in equivalent of treeAggregate) reduces to
  ONE row per touched parameter before the driver applies the update and
  re-broadcasts. The driver therefore receives O(touched params), never
  O(batches × params) — the reduction happens in the shuffle.

Determinism: negatives and batch sampling are seeded from (edge id, epoch)
hashes, so retries/stragglers can't change the result (UDF retry safety at
cluster scale).

Scale notes: parameter matrices are (n_entities + n_relations) × dim and are
broadcast each epoch — at web scale shard the entity matrix by hash and
train per-shard (parameter-server pattern); the mergeable-partials kernel
and seeded sampling carry over unchanged.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T, Window as W


def edges_from_tuples(tuples: DataFrame) -> DataFrame:
    """(subj, rel, obj) training edges: one per relation segment."""
    return (
        tuples.select("subj", F.explode("rels").alias("rel"), "obj")
        .groupBy("subj", "rel", "obj")
        .agg(F.count(F.lit(1)).alias("w"))
    )


class TransEModel:
    def __init__(self, ent2id: dict[str, int], rel2id: dict[str, int],
                 dim: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        bound = 6.0 / np.sqrt(dim)
        self.ent2id, self.rel2id = ent2id, rel2id
        self.E = rng.uniform(-bound, bound, (max(len(ent2id), 1), dim))
        self.R = rng.uniform(-bound, bound, (max(len(rel2id), 1), dim))
        self._normalize()
        self.dim = dim

    def _normalize(self):
        norms = np.maximum(np.linalg.norm(self.E, axis=1, keepdims=True), 1e-12)
        self.E = self.E / norms


def save_model(model: TransEModel, path: str, epoch: int) -> None:
    """Epoch checkpoint: parameters + vocab + last completed epoch.
    Atomic (a killed run never leaves a torn file); scheme-aware via fsio
    so s3a://-style workdirs checkpoint too."""
    import json

    from . import fsio

    fsio.write_text_atomic(path, json.dumps({
        "epoch": epoch,
        "dim": model.dim,
        "ents": sorted(model.ent2id, key=model.ent2id.get),
        "rels": sorted(model.rel2id, key=model.rel2id.get),
        "E": model.E.tolist(),
        "R": model.R.tolist(),
    }))


def load_model(path: str) -> tuple[TransEModel, int] | None:
    import json

    from . import fsio

    raw = fsio.read_text(path)
    if raw is None:
        return None
    blob = json.loads(raw)
    m = TransEModel({e: i for i, e in enumerate(blob["ents"])},
                    {r: i for i, r in enumerate(blob["rels"])},
                    dim=blob["dim"])
    m.E = np.asarray(blob["E"])
    m.R = np.asarray(blob["R"])
    return m, int(blob["epoch"])


def presum_grads(partials: DataFrame) -> DataFrame:
    """treeAggregate-equivalent reduction of mergeable gradient partials.

    posexplode each grad array to (kind, idx, pos, v) and SUM — a plain
    codegen'd hash aggregate whose map-side partial combine collapses the
    per-task partials before the exchange, so shuffled volume is bounded
    by touched-params × dim regardless of task count. (The earlier
    zip_with-fold-over-collect_list formulation evaluated an interpreted
    lambda per partial per element — cost grew linearly with cluster
    size and made TransE *anti-scale* 8→32 cores.) The 16-element vector
    reassembly (sort_array over structs) touches one tiny array per
    parameter. Gradient components are sums of ±1 margin signs — integer-
    valued doubles — so fp addition is exact and order-insensitive: the
    reduction is bit-identical to a numpy merge in any order."""
    return (
        partials.select("kind", "idx", F.posexplode("g").alias("pos", "v"))
        .groupBy("kind", "idx", "pos")
        .agg(F.sum("v").alias("v"))
        .groupBy("kind", "idx")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"]).alias("g"))
    )


def fit(
    spark: SparkSession, tuples: DataFrame,
    dim: int = 16, epochs: int = 20, lr: float = 0.05, margin: float = 1.0,
    sample_fraction: float = 1.0, seed: int = 42,
    checkpoint_path: str | None = None, checkpoint_every: int = 5,
) -> TransEModel:
    """Mini-batch TransE training. Each epoch is ONE Arrow job over the
    cached edge table: a mapInPandas gradient kernel emits compacted
    per-batch gradient rows (kind, idx, grad[dim]); a JVM-side
    `groupBy(kind, idx)` elementwise array pre-sum (partial agg map-side,
    exchange on the parameter key — the treeAggregate reduction shape)
    collapses them to one row per touched parameter before collect. The
    driver receives O(touched params) rows regardless of cluster size and
    applies one update per parameter. Gradients ride the same Arrow
    python-worker pool as every other stage (no separate RDD-API pickle
    workers — those cold-start a second pool and dominated wall time at
    high core counts). Remaining web-scale step (documented, not needed at
    this entity count): hash-shard E across executors parameter-server
    style; the mergeable partials and seeded sampling carry over."""
    from pyspark import StorageLevel

    edges = edges_from_tuples(tuples)
    # id resolution + per-edge base hash JVM-side, materialized once
    edf = edges.select(
        "subj", "rel", "obj",
        F.xxhash64("subj", "rel", "obj", F.lit(seed)).alias("h"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Right-size the epoch task count to the edge volume: the distinct
    # edge table is often far smaller than the corpus (bounded entity
    # vocabulary), and running every epoch as <shuffle_partitions> tiny
    # tasks makes training pure per-task overhead that grows with core
    # count (measured: TransE anti-scaled 8→32 cores before this).
    # ~20k edges per task keeps python kernels amortized; large edge
    # tables keep full parallelism.
    n_edges = edf.count()
    want = max(1, min(edf.rdd.getNumPartitions(), n_edges // 20_000))
    if want < edf.rdd.getNumPartitions():
        edf.unpersist()
        edf = edf.coalesce(want).persist(StorageLevel.MEMORY_AND_DISK)
        edf.count()
    # one job for both vocabularies (entities + relations, tagged union)
    vocab = (
        edf.select(F.col("subj").alias("t"), F.lit("e").alias("k"))
        .union(edf.select(F.col("obj"), F.lit("e")))
        .union(edf.select(F.col("rel"), F.lit("r")))
        .distinct().collect()
    )
    ents = sorted(r.t for r in vocab if r.k == "e")
    rels = sorted(r.t for r in vocab if r.k == "r")
    model = TransEModel({e: i for i, e in enumerate(ents)},
                        {r: i for i, r in enumerate(rels)}, dim=dim, seed=seed)
    if not ents or not rels:
        edf.unpersist()
        return model

    # mid-run resume (north_star: the embed stage resumes mid-run): pick up
    # from the last epoch checkpoint when vocab matches; epoch keys are
    # derived from (edge hash, epoch), so the continuation is identical to
    # an uninterrupted run
    start_epoch = 0
    if checkpoint_path is not None:
        ck = load_model(checkpoint_path)
        if ck is not None and ck[0].ent2id == model.ent2id \
                and ck[0].rel2id == model.rel2id and ck[0].dim == dim:
            model, start_epoch = ck[0], ck[1] + 1

    sc = spark.sparkContext
    n_ent = len(ents)
    e2i, r2i = model.ent2id, model.rel2id
    grad_schema = "kind string, idx long, g array<double>"

    for epoch in range(start_epoch, epochs):
        bc = sc.broadcast((model.E, model.R))

        def grads(batches):
            E, R = bc.value
            for pdf in batches:
                hi = pdf["subj"].map(e2i).to_numpy(dtype=np.int64)
                ri = pdf["rel"].map(r2i).to_numpy(dtype=np.int64)
                ti = pdf["obj"].map(e2i).to_numpy(dtype=np.int64)
                # splitmix-style epoch mix of the precomputed base hash
                # (constants folded in Python ints — intended mod-2^64 wrap)
                key = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64).copy()
                key += np.uint64((epoch * 0x9E3779B97F4A7C15) % (1 << 64))
                key ^= key >> np.uint64(31)
                key *= np.uint64(0xBF58476D1CE4E5B9)
                key ^= key >> np.uint64(27)
                if sample_fraction < 1.0:
                    keep = ((key % np.uint64(10_000)).astype(np.float64)
                            / 10_000.0 < sample_fraction)
                    hi, ri, ti, key = hi[keep], ri[keep], ti[keep], key[keep]
                if hi.size == 0:
                    continue
                corrupt_head = ((key >> np.uint64(8)) & np.uint64(1)).astype(bool)
                ni = ((key >> np.uint64(16)) % np.uint64(n_ent)).astype(np.int64)
                hi2 = np.where(corrupt_head, ni, hi)
                ti2 = np.where(corrupt_head, ti, ni)
                rr = R[ri]
                pos = E[hi] + rr - E[ti]
                neg = E[hi2] + rr - E[ti2]
                loss = margin + np.abs(pos).sum(axis=1) - np.abs(neg).sum(axis=1)
                act = loss > 0
                if not act.any():
                    continue
                gp = np.sign(pos[act])      # d|x|/dx
                gn = np.sign(neg[act])
                # scatter-add into compacted per-batch gradient rows
                eidx = np.concatenate([hi[act], ti[act], hi2[act], ti2[act]])
                egrd = np.concatenate([gp, -gp, -gn, gn])
                uniq, inv = np.unique(eidx, return_inverse=True)
                accE = np.zeros((uniq.size, E.shape[1]))
                np.add.at(accE, inv, egrd)
                runiq, rinv = np.unique(ri[act], return_inverse=True)
                accR = np.zeros((runiq.size, R.shape[1]))
                np.add.at(accR, rinv, gp - gn)
                yield pd.DataFrame({
                    "kind": ["e"] * uniq.size + ["r"] * runiq.size,
                    "idx": np.concatenate([uniq, runiq]),
                    "g": [list(v) for v in accE] + [list(v) for v in accR],
                })

        # JVM-side elementwise pre-sum: one shuffled row per touched
        # parameter reaches the driver (never one per batch partial)
        presummed = presum_grads(
            edf.mapInPandas(grads, schema=grad_schema))
        for row in presummed.collect():
            g = np.asarray(row.g)
            if row.kind == "e":
                model.E[row.idx] -= lr * g
            else:
                model.R[row.idx] -= lr * g
        bc.unpersist()
        model._normalize()
        if checkpoint_path is not None and (
                (epoch + 1) % checkpoint_every == 0 or epoch == epochs - 1):
            save_model(model, checkpoint_path, epoch)
    edf.unpersist()
    return model


def embeddings_df(spark: SparkSession, model: TransEModel) -> DataFrame:
    """Materialized embedding tables (FIXTURES.md §6 shape)."""
    rows = [(p, "entity", [float(x) for x in model.E[i]])
            for p, i in model.ent2id.items()]
    rows += [(p, "relation", [float(x) for x in model.R[i]])
             for p, i in model.rel2id.items()]
    return spark.createDataFrame(
        rows, schema="phrase string, kind string, vec array<float>")


def score_and_rank(spark: SparkSession, tuples: DataFrame,
                   model: TransEModel) -> DataFrame:
    """M12 + W1: score = ‖e_subj + mean(e_rels) − e_obj‖₁
    (postprocessing.py:40-50), rank per doc ascending (better = smaller)."""
    bc = spark.sparkContext.broadcast(
        (model.E, model.R, model.ent2id, model.rel2id))

    @F.pandas_udf(T.DoubleType())
    def transe_score(subj: pd.Series, rels: pd.Series, obj: pd.Series) -> pd.Series:
        E, R, e2i, r2i = bc.value
        out = []
        for s, rl, o in zip(subj, rels, obj):
            if s not in e2i or o not in e2i:
                out.append(float("nan"))
                continue
            rvecs = [R[r2i[r]] for r in rl if r in r2i]
            if not rvecs:
                out.append(float("nan"))
                continue
            rm = np.mean(rvecs, axis=0)
            out.append(float(np.abs(E[e2i[s]] + rm - E[e2i[o]]).sum()))
        return pd.Series(out)

    scored = tuples.withColumn(
        "score", transe_score(F.col("subj"), F.col("rels"), F.col("obj")))
    w = W.partitionBy("doc_id").orderBy(F.asc_nulls_last("score"),
                                        F.asc("sent_id"), F.asc("subj"))
    return scored.withColumn("rank", F.row_number().over(w))
