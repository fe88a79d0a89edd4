"""Batch-equivalent declared checks for the streaming surface (Q25-Q27).

Populated in milestone M5.
"""
