"""Model layer: module library, encoders, decoders, attention, estimator-style models."""
