from .trades import TRADES_SCHEMA, events_to_trades, read_trades_parquet, read_binance_csv

__all__ = ["TRADES_SCHEMA", "events_to_trades", "read_trades_parquet", "read_binance_csv"]
