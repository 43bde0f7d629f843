"""erex — a Ray-Data-native event/temporal/causal relation extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
paramitamirza/EventRelationExtractor (CATENA lineage) as a streaming
Ray Data pipeline over a Parquet corpus
``(repo, path, commit, lang, content)``:

    read_parquet -> map_batches(parse TXP + mention model + rule sieves +
    pair features)  [stateless tasks]
    -> map_batches(LiblinearScorer)  [actor pool, weights loaded once]
    -> groupby(doc_sha).map_groups(sieve merge + anchor reasoning +
       CLINK post-edit + point-algebra closure)
    -> edge/node Parquet partitions via a canonicalization shuffle.

The library never calls ray.init()/ray.shutdown(); sessions are owned by
the driver, bench.py, or the test fixture.
"""

__version__ = "0.5.0"
