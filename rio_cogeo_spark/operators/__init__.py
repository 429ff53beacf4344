"""Distributed operators: translate (pyramid build), validate, info, joins,
dedup/similarity, multimodal plumbing."""
