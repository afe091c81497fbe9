"""Relational + pipeline operators, each a declarative DataFrame transform."""
