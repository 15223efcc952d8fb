"""ReMine-Global: TransE-style cohesiveness scoring (SURVEY §2 M12/M13, J7, W1).

The reference consumes externally-trained embeddings (postprocessing.py:7-25;
the trainer is absent from the repo — utils.py:236-240 only preps its corpus)
and ranks tuples by ‖e_subj + mean(e_rel) − e_obj‖₁ (postprocessing.py:27-55).
Per the north star this engine trains those embeddings itself with the
translating objective s + p ≈ o:

- training edges: tuples exploded to (subj, rel, obj)
- margin ranking loss, L1 distance, head/tail corruption negatives
- mini-batch SGD where each epoch is one deterministic sample of the edge
  table; per-partition gradient partial sums are reduced with
  ``RDD.treeAggregate`` (log-depth combine — no driver fan-in bottleneck),
  the driver applies the update and re-broadcasts.

Determinism: negatives and batch sampling are seeded from (edge id, epoch)
hashes, so retries/stragglers can't change the result (UDF retry safety at
cluster scale).

Scale notes: parameter matrices are (n_entities + n_relations) × dim and are
broadcast each epoch — at web scale shard the entity matrix by hash and
train per-shard (parameter-server pattern); the treeAggregate reduction and
seeded sampling carry over unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T, Window as W


def _stable_hash(*parts) -> int:
    h = hashlib.md5("\x1f".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


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


def fit(
    spark: SparkSession, tuples: DataFrame,
    dim: int = 16, epochs: int = 20, lr: float = 0.05, margin: float = 1.0,
    sample_fraction: float = 1.0, seed: int = 42,
) -> TransEModel:
    edges = edges_from_tuples(tuples).cache()
    # one job for both vocabularies (entities + relations, tagged union)
    vocab = (
        edges.select(F.col("subj").alias("t"), F.lit("e").alias("k"))
        .union(edges.select(F.col("obj"), F.lit("e")))
        .union(edges.select(F.col("rel"), F.lit("r")))
        .distinct().collect()
    )
    ents = sorted(r.t for r in vocab if r.k == "e")
    rels = sorted(r.t for r in vocab if r.k == "r")
    model = TransEModel({e: i for i, e in enumerate(ents)},
                        {r: i for i, r in enumerate(rels)}, dim=dim, seed=seed)
    if not ents or not rels:
        edges.unpersist()
        return model

    sc = spark.sparkContext
    n_ent = len(ents)
    # Pre-resolve ids and the per-edge base hash ONCE (md5 per edge per epoch
    # was the old hot spot); the epoch key is derived arithmetically below —
    # still deterministic per (edge, epoch), so retries are stable.
    e2i, r2i = model.ent2id, model.rel2id
    edge_rdd = edges.select("subj", "rel", "obj").rdd.map(
        lambda r: (e2i[r[0]], r2i[r[1]], e2i[r[2]], _stable_hash(r[0], r[1], r[2]))
    ).cache()

    for epoch in range(epochs):
        bc = sc.broadcast((model.E, model.R))

        def grads(part):
            E, R = bc.value
            rows = list(part)
            if not rows:
                yield ({}, {})
                return
            arr = np.asarray(rows, dtype=np.uint64)
            hi, ri, ti = (arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64),
                          arr[:, 2].astype(np.int64))
            # splitmix-style epoch mix of the precomputed base hash
            # (epoch constant folded in Python ints — intended mod-2^64 wrap)
            epoch_mix = np.uint64((epoch * 0x9E3779B97F4A7C15) % (1 << 64))
            key = arr[:, 3] + epoch_mix
            key ^= key >> np.uint64(31)
            key *= np.uint64(0xBF58476D1CE4E5B9)
            key ^= key >> np.uint64(27)
            if sample_fraction < 1.0:
                keep = (key % np.uint64(10_000)).astype(np.float64) / 10_000.0 < sample_fraction
                hi, ri, ti, key = hi[keep], ri[keep], ti[keep], key[keep]
                if hi.size == 0:
                    yield ({}, {})
                    return
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
                yield ({}, {})
                return
            gp = np.sign(pos[act])
            gn = np.sign(neg[act])
            # scatter-add into compacted per-partition gradient rows
            eidx = np.concatenate([hi[act], ti[act], hi2[act], ti2[act]])
            egrd = np.concatenate([gp, -gp, -gn, gn])
            uniq, inv = np.unique(eidx, return_inverse=True)
            accE = np.zeros((uniq.size, E.shape[1]))
            np.add.at(accE, inv, egrd)
            dE = {int(k): accE[j] for j, k in enumerate(uniq)}
            runiq, rinv = np.unique(ri[act], return_inverse=True)
            accR = np.zeros((runiq.size, R.shape[1]))
            np.add.at(accR, rinv, gp - gn)
            dR = {int(k): accR[j] for j, k in enumerate(runiq)}
            yield (dE, dR)

        def merge(a, b):
            (ae, ar), (be, br) = a, b
            for k, v in be.items():
                ae[k] = ae.get(k, 0) + v
            for k, v in br.items():
                ar[k] = ar.get(k, 0) + v
            return (ae, ar)

        if edge_rdd.getNumPartitions() <= 64:
            # small fan-in: plain aggregate = one stage per epoch
            dE, dR = edge_rdd.mapPartitions(grads).aggregate(
                ({}, {}), merge, merge)
        else:
            # cluster scale: log-depth combine, no driver fan-in bottleneck
            dE, dR = edge_rdd.mapPartitions(grads).treeAggregate(
                ({}, {}), merge, merge, depth=2)
        bc.unpersist()
        for k, v in dE.items():
            model.E[k] -= lr * v
        for k, v in dR.items():
            model.R[k] -= lr * v
        model._normalize()
    edge_rdd.unpersist()
    edges.unpersist()
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
