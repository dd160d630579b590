"""Operator modules; importing them registers every op key in ``registry``."""
