"""ShardPack container format: pure-Python codec + Spark DataSource V2.

The byte layout follows the reference specification
(/root/reference/docs/draft.md:33-127): record blocks (record header, key,
record metadata, M file entries) followed by an EOF index (record count,
offset table, shard metadata, magic footer).  Divergences of the reference
*code* from its spec (SURVEY.md §0.1 D1-D14) are deliberately not
reproduced — we build to the spec.
"""
