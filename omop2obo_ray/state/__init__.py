"""Broadcast state: the ontology lexicon built once, shipped via ``ray.put``."""
