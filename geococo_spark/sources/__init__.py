"""Sources/sinks: synthetic datagen, COCO JSON round-trip."""
