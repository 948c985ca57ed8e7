"""ML operators: the reference's train/infer pair (SURVEY section 2.9)."""
