"""Wire-format parity with the reference's gRPC surface.

The reference serves ``Put/Get/Load/GetMetrics/GetStats`` as gRPC RPCs
over the proto3 messages in ``src/ahghee.grpc/types.proto``. This
package speaks the same MESSAGE wire format from the Python stdlib
(``ekati_spark.wire.proto`` — no grpcio/protobuf dependency exists in
this environment), and frames streams with the standard 5-byte gRPC
length prefix (``ekati_spark.wire.framing``).

Documented deviation (PARITY.md): the TRANSPORT is HTTP/1.1 (the
stdlib daemon in ``ekati_spark.server``) rather than gRPC-over-HTTP/2,
because grpcio cannot be installed here. Message bytes are
reference-compatible; a real gRPC endpoint would reuse these codecs
unchanged.
"""
