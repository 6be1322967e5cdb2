"""Scalar/decode function surface (the reference's ``DeserializationSchema``
layer plus topic matching, text analysis, and vector math helpers)."""
