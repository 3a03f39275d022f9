"""Catalyst-native Column builders (JVM-side, codegen'd — no Python UDFs)."""
