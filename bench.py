"""Benchmark harness — prints ONE JSON line with per-query wall times.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. PageRank throughput is reported as edges/sec
(E x iterations / wall) alongside raw seconds.

Protocol: per query, $SPARK_GRAFT_BENCH_WARMUP warmup run(s) then the MEDIAN
of $SPARK_GRAFT_BENCH_RUNS timed runs (defaults 1 + 3 — mirrors
bench/scaling.py and the reference's own `-r/--runs` repetition harness,
scripts/benchmark/run.py). A single-sample harness made round-over-round
deltas VM-noise-dominated (round-2 finding); per-query raw samples are
emitted in `samples` so spread is visible. `value` is the sum of per-query
medians (one effective pass — comparable across rounds); the raw harness
wall including warmups/repeats is `wall_seconds_total`.

Scaling-efficiency protocol (two-cluster-size stand-in) lives in
bench/scaling.py, which launches the PageRank workload at local[8] and
local[32] in separate JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagerank_spark.session import get_spark

PR_ITERS = 10
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
WARMUP = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))


def run_bench(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pagerank_spark.algos.components import connected_components
    from pagerank_spark.algos.pagerank import pagerank
    from pagerank_spark.algos.triangles import triangle_count
    from pagerank_spark.operators.dedup import exact_dedup, minhash_dedup
    from pagerank_spark.operators.similarity import cosine_topk_bruteforce
    from pagerank_spark.operators.textops import text_profile
    from pagerank_spark.sources.graphs import events_graph, hub_skew_graph, lineitem_copurchase_graph

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    edges = events_graph(spark, sf_dir).persist()
    n_edges = edges.count()

    def timed(name, fn):
        for _ in range(WARMUP):
            fn()
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        timings[name] = round(statistics.median(runs), 3)
        samples[name] = runs
        # nudge the ContextCleaner: iterative queries leave localCheckpoint
        # blocks that are freed on JVM GC; without this, block storage from
        # repeated runs leaks pressure into the NEXT query's measurement
        spark.sparkContext._jvm.System.gc()

    timed("pagerank_join_10it", lambda: pagerank(edges, max_iters=PR_ITERS, tol=0.0, mode="join", check_every=3).ranks.count())
    extras["pagerank_join_edges_per_sec"] = round(n_edges * PR_ITERS / timings["pagerank_join_10it"], 1)
    # CSR/Arrow mode is a semantics-parity feature, NOT a headline entry:
    # measured 1.2x slower at 5M and 2.4x slower at 20M edges than the
    # JVM-resident SHJ plan (per-superstep Arrow transfer of every edge row;
    # Spark gives Python workers no cross-job partition affinity, so the CSR
    # block cannot stay resident) — see BENCH/SCALING_NOTES.md §4.
    timed("weighted_pagerank_10it", lambda: pagerank(
        edges.withColumn("weight", (F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(5))).cast("double")),
        max_iters=PR_ITERS, tol=0.0, weight_col="weight", check_every=3,
    ).ranks.count())
    timed("connected_components", lambda: connected_components(edges).count())

    # scale-meaningful graphs (the sf-dir graphs are tiny): deterministic
    # synthetic hub-skewed digraphs, reference "small"/"med"-dataset territory
    synth = hub_skew_graph(spark, v=1_000_000, e=5_000_000, n_hubs=100, seed=9).persist()
    n_synth = synth.count()
    timed("pagerank_synth5m_10it", lambda: pagerank(synth, max_iters=PR_ITERS, tol=0.0, mode="join", check_every=2).ranks.count())
    extras["pagerank_synth5m_edges_per_sec"] = round(n_synth * PR_ITERS / timings["pagerank_synth5m_10it"], 1)
    timed("cc_synth5m", lambda: connected_components(synth).count())
    synth.unpersist()

    synth20 = hub_skew_graph(spark, v=4_000_000, e=20_000_000, n_hubs=400, seed=9).persist()
    n_synth20 = synth20.count()
    timed("pagerank_synth20m_5it", lambda: pagerank(synth20, max_iters=5, tol=0.0, mode="join", check_every=2).ranks.count())
    extras["pagerank_synth20m_edges_per_sec"] = round(n_synth20 * 5 / timings["pagerank_synth20m_5it"], 1)
    synth20.unpersist()

    co = lineitem_copurchase_graph(spark, sf_dir).persist()
    timed("triangles_copurchase", lambda: triangle_count(co))
    co.unpersist()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    timed("text_profile", lambda: text_profile(docs).count())
    timed("exact_dedup", lambda: exact_dedup(docs).count())
    timed("minhash_dedup", lambda: minhash_dedup(docs).count())
    docs.unpersist()

    # dedup at volume: 200k synthetic docs, ~1% planted exact dups — the
    # JVM-side signature projection dominates; CC runs only over paired docs
    from pagerank_spark.sources.docs import synth_docs

    big_docs = synth_docs(spark, 200_000, dup_every=100).persist()
    big_docs.count()
    timed("minhash_dedup_200k", lambda: minhash_dedup(big_docs, threshold=0.9).count())
    big_docs.unpersist()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("ann_topk_bruteforce", lambda: cosine_topk_bruteforce(emb, 0, k=10).count())

    # round-3 additions — appended AFTER the shared r1/r2 sequence so the
    # in-JVM ordering of shared queries stays comparable round-over-round
    from pagerank_spark.algos.gnn import neighborhood_mean
    from pagerank_spark.operators.trainprep import decontaminate, tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    timed("decontam_13gram", lambda: decontaminate(
        docs, docs.filter(F.col("doc_id") % 37 == 0), n=13).count())
    timed("tfidf_top3", lambda: tfidf_top_terms(docs, k=3).count())
    docs.unpersist()

    emb64 = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    n_emb = emb64.count()
    verts = (
        edges.select(F.col("src").alias("id")).union(edges.select("dst")).dropDuplicates()
    )
    feats = verts.join(emb64, verts.id % n_emb == emb64.vec_id).select("id", "embedding").persist()
    feats.count()
    timed("gnn_2hop_64d", lambda: neighborhood_mean(edges, feats, hops=2).count())
    feats.unpersist()

    # late round-3 additions — appended after everything above (ordering
    # comparability of the shared sequence preserved)
    from pagerank_spark.algos.scc import strongly_connected_components
    from pagerank_spark.algos.walks import negative_samples
    from pagerank_spark.operators.bpe import learn_bpe_merges
    from pagerank_spark.sources.graphs import synth_cyclic

    cyc = synth_cyclic(spark, 200_000, block=10).persist()
    cyc.count()
    timed("scc_synth200k", lambda: strongly_connected_components(cyc).labels.count())
    cyc.unpersist()

    big_docs = synth_docs(spark, 100_000, dup_every=100).persist()
    big_docs.count()
    timed("bpe_learn6_100k", lambda: learn_bpe_merges(big_docs, k=6).count())
    big_docs.unpersist()

    prs = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    timed("neg_samples_k3", lambda: negative_samples(prs, k=3, table_size=1024).count())

    # round-4 addition (appended after the shared sequence): the wide-D
    # Arrow gather path — 1024-dim features through one mapInArrow hop
    # (the exploded path cannot build its hash relation at this width)
    verts2 = (
        edges.select(F.col("src").alias("id")).union(edges.select("dst")).dropDuplicates()
    )
    feats1k = verts2.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(1023)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0),
        ).alias("embedding"),
    ).persist()
    feats1k.count()
    timed("gnn_1hop_1024d_arrow", lambda: neighborhood_mean(
        edges, feats1k, hops=1, mode="arrow").count())
    feats1k.unpersist()

    # round-4 corpus-quality additions (appended after everything above):
    # ExactSubstr repeated-span removal at 100k-doc volume (gram stream ~
    # the decontam cost class) and CCNet-style LM train+score on the sf
    # documents table
    from pagerank_spark.operators.lm import lm_score, train_bigram_lm
    from pagerank_spark.operators.trainprep import remove_repeated_spans

    # action = SUM over computed columns: a bare count() lets Catalyst
    # eliminate the unique-key left joins and skip the actual work
    big_docs = synth_docs(spark, 100_000, dup_every=100).persist()
    big_docs.count()
    timed("exactsubstr_100k", lambda: remove_repeated_spans(big_docs, k=5)
          .agg(F.sum("n_removed")).collect())
    big_docs.unpersist()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()

    def _lm():
        uni, bi, v = train_bigram_lm(docs.filter(F.col("lang") == "en"))
        return lm_score(docs, uni, bi, v).agg(F.sum("surprisal_micro")).collect()

    timed("lm_train_score", _lm)
    docs.unpersist()

    # round-4 session-3 additions (appended after everything above):
    # exact set-similarity join at 50k-doc volume (prefix filtering keeps the
    # candidate join rarest-token-bucketed; the planted dup groups make the
    # output non-trivial) and second-order biased walks (the gather join +
    # per-step (prev, dst) membership probe). Actions aggregate computed
    # columns per the count()-elision audit (SCALING_NOTES §12).
    from pagerank_spark.algos.walks import node2vec_walks
    from pagerank_spark.operators.dedup import jaccard_similarity_join

    big_docs = synth_docs(spark, 50_000, dup_every=100).persist()
    big_docs.count()
    timed("jaccard_join_50k", lambda: jaccard_similarity_join(big_docs, threshold_pct=90)
          .agg(F.sum("jaccard_micro")).collect())
    big_docs.unpersist()

    timed("node2vec_len4", lambda: node2vec_walks(edges, walk_len=4)
          .agg(F.sum("v")).collect())

    # round-4 session-4 addition (appended): Louvain on a planted community
    # graph at volume — 10k 8-cliques ring-bridged (80k vertices, ~290k
    # undirected edges); phase 1's parity-gated move rounds do the work,
    # the contraction phase then certifies no merge improves Q. Action sums
    # the community labels (computed column, not a count()).
    from pagerank_spark.algos.louvain import louvain
    from pagerank_spark.sources.graphs import clique_ring

    cr = clique_ring(spark, n_cliques=10_000, size=8).persist()
    cr.count()
    timed("louvain_cliquering_80k", lambda: louvain(cr, max_phases=2, max_rounds=6)
          .agg(F.sum("community")).collect())
    cr.unpersist()

    # round-4 session-5 additions (appended): market-basket mining over the
    # full sf lineitem (pair+triple supports), and the grid radius join over
    # customer-derived points. Actions sum computed columns (§12 audit).
    from pagerank_spark.operators.mining import frequent_itemsets
    from pagerank_spark.operators.spatial import radius_join

    baskets = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("basket_id"), F.col("l_partkey").alias("item")
    )
    timed("itemsets_lineitem_sf", lambda: frequent_itemsets(baskets, minsup=2)
          .agg(F.sum("support")).collect())

    pts = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") * 7919 % 10_000).alias("x"),
        (F.col("c_custkey") * 104729 % 10_000).alias("y"),
    )
    timed("radius_join_customers_sf", lambda: radius_join(pts, radius=60)
          .agg(F.sum("dist2")).collect())

    # ed-join over a deterministic quarter of the sf part names (TPC-H
    # names are pathologically self-similar: the FULL sf0.1 table yields
    # 3.9M ed<=1 pairs / 61s — real corpora are far sparser, so the bench
    # point uses partkey % 4 == 0 to keep the suite's wall bounded)
    from pagerank_spark.operators.stringjoin import edit_distance_join

    part_names = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        "p_partkey % 4 = 0"
    ).select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s"))
    timed("editdist_join_parts4_sf", lambda: edit_distance_join(part_names, k=1, q=3)
          .agg(F.sum("dist")).collect())

    # round-4 session-6 addition (appended): item-item CF over the full sf
    # lineitem baskets — chunked pair enumeration + cosine top-3 (the
    # recommender counterpart of the itemsets entry). Action sums the
    # integer order key (§12 audit).
    from pagerank_spark.operators.recsys import item_cooccurrence, item_topk_similar

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    timed("itemsim_lineitem_sf", lambda: item_topk_similar(
        item_cooccurrence(li, "l_orderkey", "l_partkey"), k=3)
        .agg(F.sum("cos2_micro")).collect())

    # round-4 session-7 addition (appended): weighted critical path on a
    # 800k-vertex / ~1.5M-edge layered DAG — the max-propagation fixpoint is
    # a different superstep workload from PageRank (integer max-combine,
    # constant depth regardless of width). Action sums the computed path
    # weights (§12 audit).
    from pagerank_spark.algos.dag import critical_path
    from pagerank_spark.sources.graphs import layered_dag

    dag = layered_dag(spark, 100_000, 8).persist()
    dag.count()
    timed("critpath_dag800k", lambda: critical_path(
        dag, weight_col="w", max_iters=12, check_every=4)
        .agg(F.sum("cp")).collect())
    dag.unpersist()

    # round-4 session-12 addition: unigram-LM tokenizer (vocab scoring +
    # Viterbi segmentation of the distinct-word vocabulary). Action sums
    # COMPUTED columns (n_tokens + path score) — the SCALING_NOTES §12
    # join-elimination audit rule.
    from pagerank_spark.operators.unigram import unigram_segment

    docs_t = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("unigram_tokenize_docs_sf", lambda: unigram_segment(
        docs_t, max_len=4, min_count=5)
        .agg(F.sum("n_tokens"), F.sum("score_nano")).collect())

    # round-4 session-12 addition: distributed bridge detection on a
    # star-of-cliques (3000 K8 cliques on a hub, diameter 4 — the planted
    # bridge set is exactly the 3000 hub edges, asserted). Exercises the
    # MSF + CC + BFS-rooting + XOR-rollup composition end to end.
    from pagerank_spark.algos.bridges import bridges as _bridges

    _n_c, _k = 3000, 8
    _b_base = spark.range(_n_c).select(F.col("id").alias("c"))
    _b_i = spark.range(_k).select(F.col("id").alias("i"))
    _b_j = spark.range(_k).select(F.col("id").alias("j"))
    _b_cl = (
        _b_base.crossJoin(_b_i).crossJoin(_b_j).filter(F.col("i") < F.col("j"))
        .select((F.col("c") * _k + F.col("i") + 1).alias("src"),
                (F.col("c") * _k + F.col("j") + 1).alias("dst"))
    )
    _b_hub = _b_base.select(F.lit(0).alias("src"), (F.col("c") * _k + 1).alias("dst"))
    _b_e = _b_cl.unionByName(_b_hub).persist()
    _b_e.count()

    def _bridges_run():
        nb = _bridges(_b_e, max_iters=10).filter("is_bridge = 1").count()
        assert nb == _n_c, nb
        return nb

    timed("bridges_star_87k", _bridges_run)
    _b_e.unpersist()

    # round-4 session-10 addition (appended): the north-star composition at
    # volume — synthetic multi-turn transcripts (200k conversations, ~1.3M
    # turns) through the FULL ETL (dense vertex ids -> reply+tool edge
    # derivation) into 5 PageRank supersteps. Timed as one composition (the
    # ETL is part of the workload a transcript-analytics user pays every
    # refresh); edge count and edges/sec recorded as extras.
    from pagerank_spark.operators.edges import transcripts_to_graph
    from pagerank_spark.sources.transcripts import synth_transcripts

    tr = synth_transcripts(spark, 200_000).persist()
    tr.count()
    _ids, _te = transcripts_to_graph(tr)
    n_tr_edges = _te.count()

    def _etl_pr():
        _, e = transcripts_to_graph(tr)
        return (
            pagerank(e, max_iters=5, tol=0.0, check_every=2)
            .ranks.agg(F.sum("rank")).collect()
        )

    timed("transcript_etl_pagerank_200k", _etl_pr)
    extras["transcript_graph_edges"] = n_tr_edges
    extras["transcript_pr_edges_per_sec"] = round(
        n_tr_edges * 5 / timings["transcript_etl_pagerank_200k"], 1
    )

    # round-5 addition (VERDICT r4 directive #7): the full LLM-training-data
    # curation composition at the ~1.3M-turn tier, one entry end to end —
    # curate (structural lint + stuck-loop + latency screens) -> kept
    # conversations flattened to documents (per-turn text equality under
    # stable (conv_id, turn_idx) ordering — the north-star invariant) ->
    # MinHash near-dup dedup over the docs plus a planted 2k-copy set ->
    # 13-gram decontamination against a deterministic eval slice -> 2048-
    # token packing placement -> train/val/test hash split. Final action
    # aggregates computed columns (§12 audit); turns/sec is the published
    # throughput extra.
    from pagerank_spark.operators.packing import hash_split, pack_chunks
    from pagerank_spark.operators.sequences import curate_conversations
    from pagerank_spark.operators.trainprep import decontaminate

    n_turns_total = tr.count()

    def _curation():
        kept = curate_conversations(tr).filter("keep = 1").select("conv_id")
        base = (
            tr.join(kept, "conv_id")
            .groupBy("conv_id")
            .agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                        lambda s: s["text"],
                    ),
                ).alias("text")
            )
            .select(F.expr("CAST(substr(conv_id, 6) AS BIGINT)").alias("doc_id"), "text")
        )
        # planted near-dup copies so the dedup stage has real groups to form
        docs = base.unionByName(
            base.filter(F.col("doc_id") < 2000).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
        canon = minhash_dedup(docs, threshold=0.9)
        uniq = docs.join(
            canon.filter("doc_id = canonical_id").select("doc_id"), "doc_id"
        )
        evald = docs.filter(F.col("doc_id") % 997 == 0).select("doc_id", "text")
        clean = (
            decontaminate(uniq, evald, n=13)
            .filter("contaminated = 0")
            .select("doc_id")
            .join(uniq, "doc_id")
        )
        packed = hash_split(pack_chunks(clean, budget=2048), "doc_id")
        return packed.agg(
            F.sum("n_chunks").alias("chunks"),
            F.sum("n_tokens").alias("toks"),
            F.count(F.lit(1)).alias("docs"),
        ).collect()

    timed("transcript_curation_1m", _curation)
    extras["curation_turns"] = n_turns_total
    extras["curation_turns_per_sec"] = round(
        n_turns_total / timings["transcript_curation_1m"], 1
    )
    tr.unpersist()

    edges.unpersist()
    return {"timings": timings, "samples": samples, "extras": extras, "n_edges": n_edges}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    t0 = time.time()
    res = run_bench(spark, sf_dir)
    wall = round(time.time() - t0, 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        # headline = sum of per-query MEDIANS: one effective pass over the
        # suite, comparable round-over-round regardless of RUNS/WARMUP
        "metric": "total_bench_seconds",
        "value": round(sum(res["timings"].values()), 3),
        "unit": "sec",
        "queries": res["timings"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pagerank_edges": res["n_edges"],
        "pagerank_iters": PR_ITERS,
        **res["extras"],
        "cpus": cpus,
        "protocol": {"runs": RUNS, "warmup": WARMUP, "stat": "median"},
        "samples": res["samples"],
        "wall_seconds_total": wall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
