"""Vectorized function surface: tile math UDFs, text analysis, vector ops."""
