"""Framework utilities: TFRecord I/O, Example proto codec, plotting."""
