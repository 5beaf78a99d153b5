"""CLI entry points: train, render, evaluate."""
