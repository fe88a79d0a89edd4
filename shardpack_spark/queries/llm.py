"""LLM-data-pipeline declared checks (Q28-Q31 and extensions).

Populated in milestone M6.
"""
