"""C# extraction: lexer → declaration parser → symbol/mention emission.

A from-scratch, pure-Python "Roslyn-equivalent" front end reproducing the
reference's symbol keys (CSharpErrorMessageFormat displays,
``Graph/Mapping/SymbolMapper.cs:43-47``), FQNs (FullyQualifiedFormat),
accessibility gates, CONTAINS/DEPENDS_ON/INVOKES extraction
(``Technologies/DotNet/CSharp/RoslynSymbolProcessor.cs``,
``MemberDependencyExtractor.cs``) — without a compiler.

Covered INVOKES shapes: invocations (incl. property-chain receivers
walked through the repo-wide member-type index), object creations,
method groups, explicit casts → conversion operators, user-defined
binary and unary operator use (typed single-token operands), implicit
conversions at declaration/assignment/return positions — the full
MemberDependencyExtractor node-kind matrix. Remaining deltas vs the
Roslyn semantic model (recall-only for the resolved-edge set): implicit
conversions at argument positions, multi-token operand typing;
overload resolution is arity-based, not type-based; external (non-repo,
non-well-known-BCL) type names in keys stay as written rather than
assembly-qualified — internally consistent, so linking is unaffected.
"""
