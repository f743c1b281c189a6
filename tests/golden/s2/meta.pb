":	]OAr*A͡NFRA"	ս	wOA09*A dPRA:
G

G
G;
G2
G+
G
GV
GT
GW
GN
GP
GM
GV
GQ
G
G4
G>
GN
GK
GC
G)
G
GQ
GR
G
G9
GM
GP
GI
GI
GD
GW
GQ
GL
G]
GE
GB
G@
GC
G
G
G
G1
G
GD
G6
GG
GQ
G'
GB
G
G
G	
color
	intensity