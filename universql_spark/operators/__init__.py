"""Large-scale training-data operators (dedup / similarity / text / multimodal).

These go beyond the reference's declared surface (SURVEY.md §2.9 notes it has
no such operators) — they are the 100 TB pipeline layer, built as
shuffle-aware DataFrame pipelines on built-in functions; Pandas UDFs appear
only where Spark SQL genuinely can't express the computation.
"""
