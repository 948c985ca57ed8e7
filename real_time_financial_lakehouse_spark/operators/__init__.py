"""Operator catalog: the SURVEY.md section-2 inventory as DataFrame builders.

Every public function here takes DataFrames in and returns a DataFrame out
(never collects), so Catalyst sees one whole logical plan per query and can
push filters into scans, prune columns, and pick join strategies globally.
"""
