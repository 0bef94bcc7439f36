// Golden-data generator for the TPU-native framework's test suite.
//
// This program compiles the REFERENCE C++ library (avaneev/avir, mounted
// read-only at /root/reference) and dumps resize outputs and designed
// filters as .npy files under tests/golden/data/.  The dumps serve as
// oracles: the new framework is tested against them at 8/16-bit output
// tolerances.  This file belongs to the test harness only — no reference
// code is copied into the framework itself.
//
// Build:  g++ -O2 -I /root/reference -o gen_golden gen_golden.cpp
// Run:    ./gen_golden <output-dir>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

#include "avir.h"

// Test-only visibility hack so the generator can dump LANCIR's internal
// Lanczos filter bank (protected nested class).
#define protected public
#include "lancir.h"
#undef protected

// ---------------------------------------------------------------------------
// Minimal .npy (format v1.0) writer.

static void write_npy( const std::string& path, const std::string& descr,
	size_t elsize, const void* data, const std::vector<size_t>& shape )
{
	std::string shapestr = "(";
	size_t total = 1;

	for( size_t i = 0; i < shape.size(); i++ )
	{
		shapestr += std::to_string( shape[ i ]);
		shapestr += ( shape.size() == 1 || i + 1 < shape.size() ? ", " : "" );
		total *= shape[ i ];
	}

	shapestr += ")";

	std::string hdr = "{'descr': '" + descr +
		"', 'fortran_order': False, 'shape': " + shapestr + ", }";

	// Pad so that magic(6)+ver(2)+len(2)+header is a multiple of 64.
	size_t hlen = hdr.size() + 1; // trailing newline
	size_t pad = ( 64 - ( 10 + hlen ) % 64 ) % 64;
	hdr += std::string( pad, ' ' );
	hdr += "\n";

	FILE* f = fopen( path.c_str(), "wb" );

	if( f == nullptr )
	{
		fprintf( stderr, "cannot open %s\n", path.c_str() );
		exit( 1 );
	}

	const unsigned char magic[ 8 ] =
		{ 0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0 };

	fwrite( magic, 1, 8, f );
	uint16_t hl = (uint16_t) hdr.size();
	fwrite( &hl, 2, 1, f );
	fwrite( hdr.data(), 1, hdr.size(), f );
	fwrite( data, elsize, total, f );
	fclose( f );
}

template< typename T >
struct NpyDescr;
template<> struct NpyDescr< uint8_t > { static const char* s() { return "|u1"; } };
template<> struct NpyDescr< uint16_t > { static const char* s() { return "<u2"; } };
template<> struct NpyDescr< float > { static const char* s() { return "<f4"; } };
template<> struct NpyDescr< double > { static const char* s() { return "<f8"; } };
template<> struct NpyDescr< uint32_t > { static const char* s() { return "<u4"; } };
template<> struct NpyDescr< int32_t > { static const char* s() { return "<i4"; } };

template< typename T >
static void save( const std::string& dir, const std::string& name,
	const std::vector< T >& v, std::vector< size_t > shape )
{
	write_npy( dir + "/" + name + ".npy", NpyDescr< T > :: s(), sizeof( T ),
		v.data(), shape );
}

// ---------------------------------------------------------------------------
// Deterministic PRNG (xorshift128, Marsaglia) mirrored bit-exactly in the
// Python test suite so inputs need not be stored.

struct XS128
{
	uint32_t x, y, z, w;

	explicit XS128( uint32_t seed )
		: x( 123456789u ^ ( seed * 2654435761u ))
		, y( 362436069u ^ ( seed * 0x9E3779B9u ))
		, z( 521288629u + seed )
		, w( 88675123u ^ ( seed << 7 ))
	{
		for( int i = 0; i < 16; i++ )
		{
			next();
		}
	}

	uint32_t next()
	{
		const uint32_t t = x ^ ( x << 11 );
		x = y; y = z; z = w;
		w = w ^ ( w >> 19 ) ^ t ^ ( t >> 8 );
		return w;
	}
};

template< typename T >
static void fillImage( std::vector< T >& v, uint32_t seed );

template<>
void fillImage< uint8_t >( std::vector< uint8_t >& v, uint32_t seed )
{
	XS128 r( seed );
	for( size_t i = 0; i < v.size(); i++ ) v[ i ] = (uint8_t) ( r.next() >> 24 );
}

template<>
void fillImage< uint16_t >( std::vector< uint16_t >& v, uint32_t seed )
{
	XS128 r( seed );
	for( size_t i = 0; i < v.size(); i++ ) v[ i ] = (uint16_t) ( r.next() >> 16 );
}

template<>
void fillImage< float >( std::vector< float >& v, uint32_t seed )
{
	XS128 r( seed );
	for( size_t i = 0; i < v.size(); i++ )
		v[ i ] = (float) ( r.next() * ( 1.0 / 4294967296.0 ));
}

template<>
void fillImage< double >( std::vector< double >& v, uint32_t seed )
{
	XS128 r( seed );
	for( size_t i = 0; i < v.size(); i++ )
		v[ i ] = r.next() * ( 1.0 / 4294967296.0 );
}

// ---------------------------------------------------------------------------

static FILE* Manifest;
static bool ManifestFirst = true;
static std::string OutDir;

static void manifestEntry( const char* name, const char* kind, int sw, int sh,
	int nw, int nh, int ch, const char* tin, const char* tout, double k,
	double kx, double ky, double ox, double oy, const char* preset,
	int gamma, int alphaidx, const char* dither, int bitdepth, double la,
	uint32_t seed )
{
	if( !ManifestFirst ) fprintf( Manifest, ",\n" );
	ManifestFirst = false;

	fprintf( Manifest,
		"  \"%s\": {\"kind\": \"%s\", \"sw\": %d, \"sh\": %d, \"nw\": %d, "
		"\"nh\": %d, \"ch\": %d, \"tin\": \"%s\", \"tout\": \"%s\", "
		"\"k\": %.17g, \"kx\": %.17g, \"ky\": %.17g, \"ox\": %.17g, "
		"\"oy\": %.17g, \"preset\": \"%s\", \"gamma\": %d, "
		"\"alphaidx\": %d, \"dither\": \"%s\", \"bitdepth\": %d, "
		"\"la\": %.17g, \"seed\": %u}",
		name, kind, sw, sh, nw, nh, ch, tin, tout, k, kx, ky, ox, oy,
		preset, gamma, alphaidx, dither, bitdepth, la, seed );
}

static const avir::CImageResizerParams& presetByName( const std::string& p )
{
	static avir::CImageResizerParamsDef Def;
	static avir::CImageResizerParamsULR ULR;
	static avir::CImageResizerParamsLR LR;
	static avir::CImageResizerParamsLow Low;
	static avir::CImageResizerParamsHigh High;
	static avir::CImageResizerParamsUltra Ultra;

	if( p == "ulr" ) return ULR;
	if( p == "lr" ) return LR;
	if( p == "low" ) return Low;
	if( p == "high" ) return High;
	if( p == "ultra" ) return Ultra;
	return Def;
}

template< typename T > static const char* tname();
template<> const char* tname< uint8_t >() { return "u8"; }
template<> const char* tname< uint16_t >() { return "u16"; }
template<> const char* tname< float >() { return "f32"; }
template<> const char* tname< double >() { return "f64"; }

template< typename Tin, typename Tout, typename fpclass >
static void runAvirT( const char* name, int sw, int sh, int nw, int nh,
	int ch, double k, double ox, double oy, const char* preset, bool gamma,
	int alphaidx, const char* dither, int bitdepth, uint32_t seed )
{
	std::vector< Tin > src( (size_t) sw * sh * ch );
	fillImage( src, seed );

	std::vector< Tout > dst( (size_t) nw * nh * ch );

	avir::CImageResizer< fpclass > r( bitdepth, 0, presetByName( preset ));
	avir::CImageResizerVars vars;
	vars.ox = ox;
	vars.oy = oy;
	vars.UseSRGBGamma = gamma;
	vars.AlphaIndex = alphaidx;

	r.resizeImage( src.data(), sw, sh, 0, dst.data(), nw, nh, ch, k, &vars );

	save( OutDir, name, dst, { (size_t) nh, (size_t) nw, (size_t) ch });
	manifestEntry( name, "avir", sw, sh, nw, nh, ch, tname< Tin >(),
		tname< Tout >(), k, 0, 0, ox, oy, preset, gamma ? 1 : 0, alphaidx,
		dither, bitdepth, 0.0, seed );
}

template< typename Tin, typename Tout >
static void runAvir( const char* name, int sw, int sh, int nw, int nh,
	int ch, double k, double ox, double oy, const char* preset, bool gamma,
	int alphaidx, const char* dither, int bitdepth, uint32_t seed )
{
	if( strcmp( dither, "errd" ) == 0 )
	{
		runAvirT< Tin, Tout, avir::fpclass_def< float, float,
			avir::CImageResizerDithererErrdINL< float > > >( name, sw, sh,
			nw, nh, ch, k, ox, oy, preset, gamma, alphaidx, dither,
			bitdepth, seed );
	}
	else
	{
		runAvirT< Tin, Tout, avir::fpclass_def< float > >( name, sw, sh,
			nw, nh, ch, k, ox, oy, preset, gamma, alphaidx, dither,
			bitdepth, seed );
	}
}

template< typename Tin, typename Tout >
static void runLancir( const char* name, int sw, int sh, int nw, int nh,
	int ch, double kx, double ky, double ox, double oy, double la,
	uint32_t seed )
{
	std::vector< Tin > src( (size_t) sw * sh * ch );
	fillImage( src, seed );

	std::vector< Tout > dst( (size_t) nw * nh * ch );

	avir::CLancIR lr;
	avir::CLancIRParams p( 0, 0, kx, ky, ox, oy );
	p.la = la;

	lr.resizeImage( src.data(), sw, sh, dst.data(), nw, nh, ch, &p );

	save( OutDir, name, dst, { (size_t) nh, (size_t) nw, (size_t) ch });
	manifestEntry( name, "lancir", sw, sh, nw, nh, ch, tname< Tin >(),
		tname< Tout >(), 0, kx, ky, ox, oy, "", 0, -1, "", 8, la, seed );
}

// ---------------------------------------------------------------------------

int main( int argc, char* argv[] )
{
	OutDir = ( argc > 1 ? argv[ 1 ] : "." );

	Manifest = fopen(( OutDir + "/manifest.json" ).c_str(), "wb" );
	fprintf( Manifest, "{\n" );

	// PRNG cross-check stream.
	{
		XS128 r( 42 );
		std::vector< uint32_t > v( 64 );
		for( int i = 0; i < 64; i++ ) v[ i ] = r.next();
		save( OutDir, "prng_check", v, { 64 });
	}

	// ---- AVIR end-to-end goldens --------------------------------------
	runAvir< uint8_t, uint8_t >( "a_up3u8", 97, 61, 151, 83, 3,
		0, 0, 0, "def", false, -1, "", 8, 1001 );
	runAvir< uint8_t, uint8_t >( "a_readme", 640, 480, 1024, 768, 3,
		0, 0, 0, "def", false, -1, "", 8, 1002 );
	runAvir< uint8_t, uint8_t >( "a_down3u8", 257, 193, 64, 48, 3,
		0, 0, 0, "def", false, -1, "", 8, 1003 );
	runAvir< uint8_t, uint8_t >( "a_down8x", 512, 384, 64, 48, 3,
		0, 0, 0, "def", false, -1, "", 8, 1004 );
	runAvir< uint16_t, uint16_t >( "a_gray16gamma", 129, 97, 51, 39, 1,
		0, 0, 0, "def", true, -1, "", 16, 1005 );
	runAvir< uint8_t, uint8_t >( "a_rgba8gamma", 100, 80, 180, 140, 4,
		0, 0, 0, "def", true, 3, "", 8, 1006 );
	runAvir< float, float >( "a_f32", 123, 91, 321, 241, 2,
		0, 0, 0, "def", false, -1, "", 8, 1007 );
	runAvir< uint8_t, uint8_t >( "a_shift", 97, 61, 97, 61, 1,
		-1.0, 0.35, -0.15, "def", false, -1, "", 8, 1008 );
	runAvir< uint8_t, uint8_t >( "a_kneg", 97, 61, 41, 27, 3,
		-2.37, 0, 0, "def", false, -1, "", 8, 1009 );
	runAvir< uint8_t, uint8_t >( "a_kpos", 97, 61, 41, 27, 3,
		2.37, 0, 0, "def", false, -1, "", 8, 1010 );
	runAvir< uint8_t, uint8_t >( "a_preset_ulr", 97, 61, 151, 83, 3,
		0, 0, 0, "ulr", false, -1, "", 8, 1011 );
	runAvir< uint8_t, uint8_t >( "a_preset_lr", 97, 61, 151, 83, 3,
		0, 0, 0, "lr", false, -1, "", 8, 1011 );
	runAvir< uint8_t, uint8_t >( "a_preset_low", 97, 61, 151, 83, 3,
		0, 0, 0, "low", false, -1, "", 8, 1011 );
	runAvir< uint8_t, uint8_t >( "a_preset_high", 97, 61, 151, 83, 3,
		0, 0, 0, "high", false, -1, "", 8, 1011 );
	runAvir< uint8_t, uint8_t >( "a_preset_ultra", 97, 61, 151, 83, 3,
		0, 0, 0, "ultra", false, -1, "", 8, 1011 );
	runAvir< uint8_t, uint8_t >( "a_presetd_ultra", 257, 193, 64, 48, 3,
		0, 0, 0, "ultra", false, -1, "", 8, 1012 );
	runAvir< uint8_t, uint8_t >( "a_dither", 97, 61, 51, 33, 3,
		0, 0, 0, "def", false, -1, "errd", 8, 1013 );
	runAvir< uint8_t, uint8_t >( "a_bits6", 97, 61, 51, 33, 3,
		0, 0, 0, "def", false, -1, "", 6, 1014 );
	runAvir< uint16_t, uint16_t >( "a_up1u16", 64, 48, 200, 150, 1,
		0, 0, 0, "def", false, -1, "", 16, 1015 );
	runAvir< uint8_t, uint16_t >( "a_in8out16", 97, 61, 51, 33, 3,
		0, 0, 0, "def", false, -1, "", 16, 1016 );
	runAvir< uint16_t, uint8_t >( "a_in16out8", 97, 61, 51, 33, 3,
		0, 0, 0, "def", false, -1, "", 8, 1017 );
	runAvir< uint8_t, uint8_t >( "a_same", 97, 61, 97, 61, 3,
		0, 0, 0, "def", false, -1, "", 8, 1018 );
	runAvir< uint8_t, uint8_t >( "a_tiny", 3, 2, 17, 9, 3,
		0, 0, 0, "def", false, -1, "", 8, 1019 );
	runAvir< uint8_t, uint8_t >( "a_one", 1, 1, 8, 8, 3,
		0, 0, 0, "def", false, -1, "", 8, 1020 );
	// fptype=double mode (fpclass_def< double >, avir.h:4569-4592)
	runAvirT< double, double, avir::fpclass_def< double > >(
		"a_f64", 123, 91, 61, 45, 2,
		0, 0, 0, "def", false, -1, "", 8, 1021 );

	// ---- LANCIR end-to-end goldens ------------------------------------
	runLancir< uint8_t, uint8_t >( "l_down4u8", 160, 120, 97, 73, 4,
		0, 0, 0, 0, 3.0, 2001 );
	runLancir< uint8_t, uint8_t >( "l_up3u8", 97, 61, 151, 83, 3,
		0, 0, 0, 0, 3.0, 2002 );
	runLancir< uint16_t, uint16_t >( "l_gray16", 123, 91, 61, 45, 1,
		0, 0, 0, 0, 3.0, 2003 );
	runLancir< float, float >( "l_f32", 64, 48, 100, 75, 2,
		0, 0, 0, 0, 2.0, 2004 );
	runLancir< uint8_t, uint8_t >( "l_la4", 160, 120, 80, 60, 3,
		0, 0, 0, 0, 4.0, 2005 );
	runLancir< uint8_t, uint8_t >( "l_shift", 97, 61, 97, 61, 1,
		-1.0, -1.0, 0.35, -0.15, 3.0, 2006 );
	runLancir< uint16_t, uint8_t >( "l_mixed", 97, 61, 51, 33, 3,
		0, 0, 0, 0, 3.0, 2007 );

	// BASELINE.json-representative configs: 16-bit 4ch sRGB-gamma upsize
	// (4K->8K proxy), sub-pixel shift + quality presets on 16-bit
	// grayscale, 16-bit error diffusion, and the LANCIR HD RGBA config.
	runAvir< uint16_t, uint16_t >( "a_rgba16gamma", 80, 60, 160, 120, 4,
		0, 0, 0, "def", true, 3, "", 16, 1021 );
	runAvir< uint16_t, uint16_t >( "a_shift16high", 129, 97, 129, 97, 1,
		-1.0, 0.35, -0.15, "high", false, -1, "", 16, 1022 );
	runAvir< uint16_t, uint16_t >( "a_shift16ultra", 129, 97, 129, 97, 1,
		-1.0, -0.27, 0.44, "ultra", false, -1, "", 16, 1023 );
	runAvir< uint16_t, uint16_t >( "a_dither16", 97, 61, 51, 33, 3,
		0, 0, 0, "def", false, -1, "errd", 12, 1024 );
	runLancir< uint8_t, uint8_t >( "l_hd", 1920, 1080, 1280, 720, 4,
		0, 0, 0, 0, 3.0, 2008 );

	// ---- Filter-design goldens -----------------------------------------

	// Peaked Cosine window, right half.
	{
		avir::CDSPWindowGenPeakedCosine w( 4.76449, 24.5 );
		std::vector< double > v( 25 );
		for( int i = 0; i < 25; i++ ) v[ i ] = w.generate();
		save( OutDir, "f_window", v, { 25 });
	}
	{
		avir::CDSPWindowGenPeakedCosine w( 1.0, 7.3 );
		std::vector< double > v( 8 );
		for( int i = 0; i < 8; i++ ) v[ i ] = w.generate();
		save( OutDir, "f_window2", v, { 8 });
	}

	// Peaked-Cosine-windowed sinc LPF.
	{
		avir::CDSPPeakedCosineLPF p( 9.2, 1.3, 4.76449 );
		std::vector< double > v( p.FilterLen );
		p.generateLPF( v.data(), 1.0 );
		save( OutDir, "f_lpf_norm", v, { (size_t) p.FilterLen });

		std::vector< double > v2( p.FilterLen );
		p.generateLPF( v2.data(), 0.0 );
		save( OutDir, "f_lpf_raw", v2, { (size_t) p.FilterLen });
	}
	{
		avir::CDSPPeakedCosineLPF p( 24.0, M_PI * 0.46437 * 2.0, 1.94609 );
		std::vector< double > v( p.FilterLen );
		p.generateLPF( v.data(), 1.0 );
		save( OutDir, "f_lpf_hb", v, { (size_t) p.FilterLen });
	}

	// Paragraphic EQ.
	{
		avir::CDSPFIREQ eq;
		eq.init( 2.0, 6.4262, 65, 0.0, 1.0, false, 0.97946 );
		std::vector< double > bins( 65 );
		for( int j = 0; j < 65; j++ ) bins[ j ] = 1.0 + 0.5 * sin( j * 0.3 );
		std::vector< double > flt( eq.getFilterLength() );
		eq.buildFilter( bins.data(), flt.data() );
		save( OutDir, "f_eq", flt, { (size_t) eq.getFilterLength() });
		std::vector< int32_t > meta = { eq.getFilterLength(),
			eq.getFilterLatency() };
		save( OutDir, "f_eq_meta", meta, { 2 });
	}
	{
		avir::CDSPFIREQ eq;
		eq.init( 2.0 * 0.31, 7.0, 65, 0.0, 0.31, false, 1.2 );
		std::vector< double > bins( 65 );
		for( int j = 0; j < 65; j++ ) bins[ j ] = 1.0 + 0.5 * sin( j * 0.3 );
		std::vector< double > flt( eq.getFilterLength() );
		eq.buildFilter( bins.data(), flt.data() );
		save( OutDir, "f_eq_bw", flt, { (size_t) eq.getFilterLength() });
	}

	// Fractional-delay filter bank, order 1.
	{
		avir::CDSPFracFilterBankLin< float > b;
		b.init( 10, 1, 18.0 / 0.7, 0.7372 * 0.7, 6.41341, avir::CFltBuffer() );
		const int fl = b.getFilterLen();
		std::vector< int32_t > meta = { fl, b.getFracCount(), b.getOrder() };
		save( OutDir, "f_bank_o1_meta", meta, { 3 });
		const int ids[ 3 ] = { 0, 3, 9 };
		std::vector< float > v( (size_t) 3 * fl * 2 );
		for( int i = 0; i < 3; i++ )
			memcpy( &v[ (size_t) i * fl * 2 ], b.getFilter( ids[ i ]),
				(size_t) fl * 2 * sizeof( float ));
		save( OutDir, "f_bank_o1", v, { 3, 2, (size_t) fl });
	}

	// Fractional-delay filter bank, order 0.
	{
		avir::CDSPFracFilterBankLin< float > b;
		b.init( 44, 0, 18.0, 0.7372, 6.41341, avir::CFltBuffer() );
		const int fl = b.getFilterLen();
		std::vector< int32_t > meta = { fl, b.getFracCount(), b.getOrder() };
		save( OutDir, "f_bank_o0_meta", meta, { 3 });
		const int ids[ 3 ] = { 0, 21, 43 };
		std::vector< float > v( (size_t) 3 * fl );
		for( int i = 0; i < 3; i++ )
			memcpy( &v[ (size_t) i * fl ], b.getFilter( ids[ i ]),
				(size_t) fl * sizeof( float ));
		save( OutDir, "f_bank_o0", v, { 3, (size_t) fl });
	}

	// Filter bank with an external filter convolved in.
	{
		avir::CFltBuffer ext;
		avir::CDSPPeakedCosineLPF p( 6.0, 2.2, 4.0 );
		ext.alloc( p.FilterLen );
		p.generateLPF( &ext[ 0 ], 2.0 );
		ext.Len2 = 6.0; ext.Freq = 2.2; ext.Alpha = 4.0; ext.DCGain = 2.0;

		avir::CDSPFracFilterBankLin< float > b;
		b.init( 10, 1, 18.0, 0.7372, 6.41341, ext );
		const int fl = b.getFilterLen();
		std::vector< int32_t > meta = { fl, b.getFracCount(), b.getOrder() };
		save( OutDir, "f_bank_ext_meta", meta, { 3 });
		const int ids[ 3 ] = { 0, 5, 9 };
		std::vector< float > v( (size_t) 3 * fl * 2 );
		for( int i = 0; i < 3; i++ )
			memcpy( &v[ (size_t) i * fl * 2 ], b.getFilter( ids[ i ]),
				(size_t) fl * 2 * sizeof( float ));
		save( OutDir, "f_bank_ext", v, { 3, 2, (size_t) fl });
	}

	// LANCIR Lanczos filters (via test-only visibility hack).
	{
		avir::CLancIR::CResizeFilters rf;
		rf.update( 3.0, 1.7, 1 );
		std::vector< int32_t > meta = { rf.KernelLen };
		save( OutDir, "f_lanc_k17_meta", meta, { 1 });
		const double fr[ 4 ] = { 0.0, 0.37, 0.5, 1.0 };
		std::vector< float > v( (size_t) 4 * rf.KernelLen );
		for( int i = 0; i < 4; i++ )
			memcpy( &v[ (size_t) i * rf.KernelLen ], rf.getFilter( fr[ i ]),
				(size_t) rf.KernelLen * sizeof( float ));
		save( OutDir, "f_lanc_k17", v, { 4, (size_t) rf.KernelLen });
	}
	{
		avir::CLancIR::CResizeFilters rf;
		rf.update( 2.0, 0.8, 1 );
		std::vector< int32_t > meta = { rf.KernelLen };
		save( OutDir, "f_lanc_k08_meta", meta, { 1 });
		const double fr[ 4 ] = { 0.0, 0.25, 0.662, 1.0 };
		std::vector< float > v( (size_t) 4 * rf.KernelLen );
		for( int i = 0; i < 4; i++ )
			memcpy( &v[ (size_t) i * rf.KernelLen ], rf.getFilter( fr[ i ]),
				(size_t) rf.KernelLen * sizeof( float ));
		save( OutDir, "f_lanc_k08", v, { 4, (size_t) rf.KernelLen });
	}

	// sRGB gamma approximation curves (reference polynomial approximations).
	{
		std::vector< double > x( 512 ), lin( 512 ), srgb( 512 );
		for( int i = 0; i < 512; i++ )
		{
			x[ i ] = i / 511.0;
			lin[ i ] = avir::convertSRGB2Lin( x[ i ], 1.0 );
			srgb[ i ] = avir::convertLin2SRGB( x[ i ]);
		}
		save( OutDir, "f_srgb_x", x, { 512 });
		save( OutDir, "f_srgb2lin", lin, { 512 });
		save( OutDir, "f_lin2srgb", srgb, { 512 });

		// uint8 LUT path
		std::vector< float > lut( 256 );
		for( int i = 0; i < 256; i++ )
			lut[ i ] = avir::convertSRGB2Lin< float >( (unsigned char) i,
				1.0f );
		save( OutDir, "f_srgb_lut8", lut, { 256 });
	}

	fprintf( Manifest, "\n}\n" );
	fclose( Manifest );

	printf( "golden data written to %s\n", OutDir.c_str() );
	return 0;
}
