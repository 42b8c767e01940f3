"""Operators: generators, mutators, and large-scale data-pipeline ops."""
