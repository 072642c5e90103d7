"""Node and service runtime: data model, GPS time, buoy node, central server."""
